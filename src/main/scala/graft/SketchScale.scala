package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Round-12 scaling harness (PLANS.md evidence): sketch-store batch
  * compaction's read-side payoff.
  *
  * A long-running stream lands one `batch=N` slot per micro-batch
  * ([[graft.ops.Sketches.appendBatch]]) — replay-idempotent, but the
  * slot count grows with stream LIFETIME, and every query's merge
  * pays the slot listing plus a per-batch state row set. Compaction
  * ([[graft.ops.Sketches.compactCmsBatches]] and siblings) folds all
  * slots at or below a safe watermark into one consolidated slot.
  *
  * This harness lands N batches of CMS/HLL/quantile-grid partials,
  * times the merged read of each family cold (fresh DataFrame per
  * measurement; median of R), compacts to the watermark N-2, and
  * times the same reads again. The claims to show:
  *
  *  - the post-compaction read touches 2 slots regardless of N;
  *  - read latency stops growing with N once compacted (the
  *    pre-compaction read grows with slot count);
  *  - answers are unchanged (CMS total bit-equal; HLL estimates
  *    equal within the rsd class; quantile estimates within the
  *    doubled grid slack — asserted, not printed).
  */
object SketchScale {
  def main(args: Array[String]): Unit = {
    val batches = if (args.nonEmpty) args(0).toInt else 64
    val rowsPerBatch = if (args.length > 1) args(1).toInt else 2000
    val runs = 3
    val spark = Harness.session()

    val root = "/tmp/graft_sketchscale"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (eps, conf, seed, lgK, k) = (0.001, 0.99, 42, 12, 64)

    def batchRows(b: Int) =
      spark.range(b.toLong * rowsPerBatch, (b + 1).toLong * rowsPerBatch)
        .select(col("id"),
          concat(lit("k"), pmod(col("id"), lit(13))).as("key"),
          pmod(col("id") * 37, lit(1000)).as("user"),
          (pmod(col("id") * 2654435761L, lit(100000)) / 100.0).as("value"))

    (0 until batches).foreach { b =>
      val br = batchRows(b)
      Sketches.appendBatch(Sketches.cmsPartials(br, "key", lit(b.toLong),
        eps, conf, seed), root, "cms", "t", b.toLong)
      Sketches.appendBatch(Sketches.hllPartials(br, "user", Seq("key"),
        lit(b.toLong), lgK), root, "hll", "t", b.toLong)
      Sketches.appendBatch(Sketches.quantilePartials(br, "value", Seq("key"),
        lit(b.toLong), k), root, "qgrid", "t", b.toLong)
    }

    def slots(kind: String): Int =
      new java.io.File(s"$root/${kind}_t").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("batch="))

    def medianMs(work: () => Unit): Long = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); work(); (System.nanoTime() - t0) / 1000000
      }.sorted
      ts(runs / 2)
    }
    def readAll(): (Long, Map[String, Long], Map[String, Double]) = {
      val cms = Sketches.mergeCms(spark, s"$root/cms_t")
      val hll = Sketches.hllEstimates(spark.read.parquet(s"$root/hll_t"),
        Seq("key"), "est").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val qe = Sketches.quantileEstimates(
        spark.read.parquet(s"$root/qgrid_t"), Seq("key"),
        Seq(0.5 -> "p50")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      (cms.totalCount(), hll, qe)
    }

    val before = readAll()
    val beforeMs = medianMs(() => readAll())
    println(f"pre-compaction : slots=${slots("cms")}%4d  merged read ${beforeMs}%5d ms")

    val w = batches.toLong - 2
    Sketches.compactCmsBatches(spark, root, "t", w)
    Sketches.compactHllBatches(spark, root, "t", w)
    Sketches.compactQuantileBatches(spark, root, "t", w, k)

    val after = readAll()
    val afterMs = medianMs(() => readAll())
    println(f"post-compaction: slots=${slots("cms")}%4d  merged read ${afterMs}%5d ms")

    // answers unchanged — asserted, not eyeballed
    require(after._1 == before._1, "CMS total changed across compaction")
    val rsd = 1.04 / math.sqrt((1 << lgK).toDouble)
    before._2.foreach { case (key, e) =>
      require(math.abs(after._2(key) - e) <= 2 * rsd * math.max(e, 1) + 1,
        s"HLL estimate drifted across compaction for $key")
    }
    // p50 drift bound in the VALUE domain: values are ~uniform on
    // [0, 1000), so the doubled grid-term rank slack (2N/k ranks)
    // maps to ≈ 2·range/k in value
    val p50Tol = 2.0 * 1000.0 / k
    before._3.foreach { case (key, p50) =>
      require(math.abs(after._3(key) - p50) <= p50Tol,
        s"p50 moved past the doubled grid slack for $key: " +
          s"$p50 -> ${after._3(key)} (tol $p50Tol)")
    }
    val n = batches.toLong * rowsPerBatch
    println(f"n=$n%d rows, answers unchanged (CMS bit-equal, HLL within rsd, p50 within doubled slack)")
    spark.stop()
  }
}
