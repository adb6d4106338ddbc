package graft

import graft.ops.Sketches
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The persisted sketch family's merge algebra: the whole design rests
  * on merges being EXACT (CMS count matrices sum; HLL registers max),
  * so any shard split of the same rows must merge to the same answers
  * as a single pass — and the quantile grids must answer any q within
  * their mergeable-summary rank slack regardless of sharding. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0 until 4000).map { i =>
    (i.toLong, s"k${i % 13}", (i * 37) % 1000, ((i * 2654435761L) % 100000) / 100.0)
  }.toDF("id", "key", "user", "value")

  test("CMS: any sharding merges to the identical sketch; epsilon bound holds") {
    val (eps, conf, seed) = (0.001, 0.99, 42)
    def merged(shards: Int) = {
      val root = Files.createTempDirectory("graft_sk").toString
      Sketches.save(Sketches.cmsPartials(rows, "key",
        pmod(col("id"), lit(shards)), eps, conf, seed), root, "cms", "t")
      Sketches.mergeCms(spark, s"$root/cms_t")
    }
    val one = merged(1)
    val seven = merged(7)
    val thirteen = merged(13)
    assert(one.totalCount() == 4000 && seven.totalCount() == 4000 &&
      thirteen.totalCount() == 4000)
    val exact = rows.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val slack = (eps * 4000).toLong
    exact.foreach { case (k, n) =>
      val (a, b, c) = (one.estimateCount(k), seven.estimateCount(k),
        thirteen.estimateCount(k))
      assert(a == b && b == c, s"CMS merge not shard-invariant for $k: $a/$b/$c")
      assert(a >= n && a <= n + slack, s"CMS bound broken for $k: $a vs $n")
    }
  }

  test("HLL: union of any sharding equals the one-pass estimate; rsd bound holds") {
    val lgK = 12
    def est(shards: Int) = {
      val root = Files.createTempDirectory("graft_sk").toString
      Sketches.save(Sketches.hllPartials(rows, "user", Seq("key"),
        pmod(col("id"), lit(shards)), lgK), root, "hll", "t")
      Sketches.hllEstimates(spark.read.parquet(s"$root/hll_t"),
        Seq("key"), "est").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val one = est(1); val five = est(5); val eleven = est(11)
    val exact = rows.groupBy("key").agg(countDistinct("user").as("nu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rsd = 1.04 / math.sqrt((1 << lgK).toDouble)
    exact.foreach { case (k, nu) =>
      // estimates agree within the error class across shardings (the
      // register merge is exact; DataSketches mode promotion can land
      // differently per path, so bit-equality is NOT the contract)
      val spread = Seq(one(k), five(k), eleven(k))
      assert(spread.max - spread.min <= 2 * rsd * nu + 1,
        s"HLL union drifted across shardings for $k: $spread")
      spread.foreach(e => assert(math.abs(e - nu) <= 5 * rsd * nu + 1,
        s"HLL bound broken for $k: $e vs $nu"))
    }
  }

  test("quantile grids: merged estimates hit their rank slack under any sharding") {
    val k = 64
    val qs = Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    for (shards <- Seq(1, 6, 16)) {
      val root = Files.createTempDirectory("graft_sk").toString
      Sketches.save(Sketches.quantilePartials(rows, "value", Seq("key"),
        pmod(col("id"), lit(shards)), k), root, "qgrid", "t")
      val ests = Sketches.quantileEstimates(
        spark.read.parquet(s"$root/qgrid_t"), Seq("key"), qs)
      // exact rank of every estimate, one aggregated pass
      val aggCols = count(lit(1)).as("N") +: qs.map { case (_, nm) =>
        sum(when(col("value") <= col(nm), 1L).otherwise(0L)).as(s"r_$nm")
      }
      val checks = rows.join(broadcast(ests), "key").groupBy("key")
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      checks.foreach { r =>
        val n = r.getLong(1)
        val slack = 2.0 * n / k + 2 * shards + 2
        qs.zipWithIndex.foreach { case ((q, nm), i) =>
          val rank = r.getLong(2 + i)
          assert(math.abs(rank - q * n) <= slack,
            s"quantile grid missed: shards=$shards key=${r.getString(0)} " +
              s"q=$q rank=$rank of $n (slack $slack)")
        }
      }
    }
  }

  // ── batch-slot compaction: a long stream's batch=N slots fold into
  // one consolidated slot without changing any answer ──────────────

  private def batchDirs(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).sorted.toSeq

  test("CMS compaction: folded slots merge bit-exactly; replay of the newest batch stays idempotent") {
    val root = Files.createTempDirectory("graft_sk").toString
    val (eps, conf, seed) = (0.001, 0.99, 42)
    def land(b: Long): Unit = Sketches.appendBatch(
      Sketches.cmsPartials(rows.filter(pmod(col("id"), lit(8)) === b),
        "key", lit(b), eps, conf, seed), root, "cms", "t", b)
    (0L until 8L).foreach(land)
    val before = Sketches.mergeCms(spark, s"$root/cms_t")
    val keys = rows.select("key").distinct().as[String].collect()
    val beforeEsts = keys.map(k => k -> before.estimateCount(k)).toMap
    assert(Sketches.compactCmsBatches(spark, root, "t", upTo = 6L) == 7)
    assert(batchDirs(s"$root/cms_t") == Seq("batch=6", "batch=7"),
      s"unexpected slots: ${batchDirs(s"$root/cms_t")}")
    val after = Sketches.mergeCms(spark, s"$root/cms_t")
    assert(after.totalCount() == 4000 &&
      keys.forall(k => after.estimateCount(k) == beforeEsts(k)),
      "CMS compaction changed an estimate — the elementwise sum must be exact")
    // the newest batch (7, above the watermark) can still be replayed
    // by a restarted checkpoint: overwrite-into-slot keeps it a no-op
    land(7L)
    assert(Sketches.mergeCms(spark, s"$root/cms_t").totalCount() == 4000,
      "a replayed post-compaction batch double-counted")
    // nothing left to fold below the watermark
    assert(Sketches.compactCmsBatches(spark, root, "t", upTo = 6L) == 0)
    // the newest slot must keep its own slot — a watermark at or above
    // it is a caller error, not a silent fold
    intercept[IllegalArgumentException] {
      Sketches.compactCmsBatches(spark, root, "t", upTo = 7L)
    }
  }

  test("HLL + quantile-grid compaction: answers hold their bounds over the consolidated slot") {
    val root = Files.createTempDirectory("graft_sk").toString
    val (lgK, k, batches) = (12, 64, 8)
    (0L until batches.toLong).foreach { b =>
      val br = rows.filter(pmod(col("id"), lit(batches)) === b)
      Sketches.appendBatch(Sketches.hllPartials(br, "user", Seq("key"),
        lit(b), lgK), root, "hll", "t", b)
      Sketches.appendBatch(Sketches.quantilePartials(br, "value", Seq("key"),
        lit(b), k), root, "qgrid", "t", b)
    }
    assert(Sketches.compactHllBatches(spark, root, "t", upTo = 6L) == 7)
    assert(Sketches.compactQuantileBatches(spark, root, "t", upTo = 6L, k) == 7)
    assert(batchDirs(s"$root/hll_t") == Seq("batch=6", "batch=7") &&
      batchDirs(s"$root/qgrid_t") == Seq("batch=6", "batch=7"))
    // HLL: the compacted state is built by the SAME union the read
    // side applies — estimates must stay in the rsd error class
    val ests = Sketches.hllEstimates(spark.read.parquet(s"$root/hll_t"),
      Seq("key"), "est").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy("key").agg(countDistinct("user").as("nu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rsd = 1.04 / math.sqrt((1 << lgK).toDouble)
    exact.foreach { case (key, nu) =>
      assert(math.abs(ests(key) - nu) <= 5 * rsd * nu + 1,
        s"HLL bound broken after compaction for $key: ${ests(key)} vs $nu")
    }
    // quantile grids: one extra summarization level — the rank slack
    // at most doubles (2·2N/k on the grid term; shard terms unchanged)
    val qs = Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90")
    val qe = Sketches.quantileEstimates(
      spark.read.parquet(s"$root/qgrid_t"), Seq("key"), qs)
    val aggCols = count(lit(1)).as("N") +: qs.map { case (_, nm) =>
      sum(when(col("value") <= col(nm), 1L).otherwise(0L)).as(s"r_$nm")
    }
    rows.join(broadcast(qe), "key").groupBy("key")
      .agg(aggCols.head, aggCols.tail: _*).collect().foreach { r =>
        val n = r.getLong(1)
        val slack = 4.0 * n / k + 2 * batches + 2
        qs.zipWithIndex.foreach { case ((q, _), i) =>
          val rank = r.getLong(2 + i)
          assert(math.abs(rank - q * n) <= slack,
            s"compacted grid missed: key=${r.getString(0)} q=$q " +
              s"rank=$rank of $n (slack $slack)")
        }
      }
  }

  test("zero-row micro-batches compact cleanly (all-empty and mixed folds)") {
    val root = Files.createTempDirectory("graft_sk").toString
    val (eps, conf, seed) = (0.001, 0.99, 42)
    def land(b: Long, src: org.apache.spark.sql.DataFrame): Unit = {
      Sketches.appendBatch(Sketches.cmsPartials(src, "key", lit(b),
        eps, conf, seed), root, "cms", "t", b)
      Sketches.appendBatch(Sketches.hllPartials(src, "user", Seq("key"),
        lit(b), 12), root, "hll", "t", b)
      Sketches.appendBatch(Sketches.quantilePartials(src, "value", Seq("key"),
        lit(b), 32), root, "qgrid", "t", b)
    }
    // batches 0-2 EMPTY (a quiet stream), 3-4 carry the rows
    (0L until 3L).foreach(b => land(b, rows.filter(lit(false))))
    land(3L, rows.filter(col("id") % 2 === 0))
    land(4L, rows.filter(col("id") % 2 === 1))
    // all-empty fold: must consolidate to an empty slot, not crash
    assert(Sketches.compactCmsBatches(spark, root, "t", upTo = 2L) == 3)
    assert(Sketches.compactHllBatches(spark, root, "t", upTo = 2L) == 3)
    assert(Sketches.compactQuantileBatches(spark, root, "t", upTo = 2L, 32) == 3)
    assert(batchDirs(s"$root/cms_t") == Seq("batch=2", "batch=3", "batch=4"))
    // mixed fold: empty consolidated slot + a data slot
    assert(Sketches.compactCmsBatches(spark, root, "t", upTo = 3L) == 2)
    assert(Sketches.compactHllBatches(spark, root, "t", upTo = 3L) == 2)
    assert(Sketches.compactQuantileBatches(spark, root, "t", upTo = 3L, 32) == 2)
    // answers intact end-to-end
    assert(Sketches.mergeCms(spark, s"$root/cms_t").totalCount() == 4000)
    val ests = Sketches.hllEstimates(spark.read.parquet(s"$root/hll_t"),
      Seq("key"), "est").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy("key").agg(countDistinct("user").as("nu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rsd = 1.04 / math.sqrt(4096.0)
    exact.foreach { case (key, nu) =>
      assert(math.abs(ests(key) - nu) <= 5 * rsd * nu + 1,
        s"HLL bound broken after empty-slot folds for $key")
    }
  }

  test("compaction crash windows roll forward from the marker") {
    val root = Files.createTempDirectory("graft_sk").toString
    (0L until 4L).foreach { b =>
      Sketches.appendBatch(Sketches.hllPartials(
        rows.filter(pmod(col("id"), lit(4)) === b), "user", Seq("key"),
        lit(b), 12), root, "hll", "t", b)
    }
    val dir = s"$root/hll_t"
    val f = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    def writeMarker(): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(dir, "_compact.json"), true)
      try out.write("""{"upTo":2,"folded":3}""".getBytes("UTF-8"))
      finally out.close()
    }
    // window 1: crash AFTER the marker, BEFORE any apply — staged dir
    // complete, nothing deleted yet. Recovery must delete slots < 2,
    // place the staged rows at batch=2, and clear the marker.
    val staged = spark.read.parquet((0 until 3).map(b => s"$dir/batch=$b"): _*)
      .groupBy("key").agg(expr("hll_union_agg(hll)").as("hll"))
      .withColumn("__shard", lit(2L))
      .select("key", "__shard", "hll")
    staged.write.parquet(s"$dir/__compacting")
    writeMarker()
    assert(Sketches.recoverCompaction(spark, root, "hll", "t"))
    assert(batchDirs(dir) == Seq("batch=2", "batch=3"),
      s"window-1 recovery left: ${batchDirs(dir)}")
    assert(!f.exists(new org.apache.hadoop.fs.Path(dir, "_compact.json")) &&
      !f.exists(new org.apache.hadoop.fs.Path(dir, "__compacting")))
    // window 2: crash AFTER the staged rename, BEFORE the marker
    // delete — no staged dir. Recovery must keep the consolidated
    // batch=2 INTACT (re-deleting it would lose the folded state).
    val consolidated = spark.read.parquet(s"$dir/batch=2").count()
    writeMarker()
    assert(Sketches.recoverCompaction(spark, root, "hll", "t"))
    assert(batchDirs(dir) == Seq("batch=2", "batch=3") &&
      spark.read.parquet(s"$dir/batch=2").count() == consolidated,
      "window-2 recovery disturbed the already-placed consolidated slot")
    // answers still meet the bound end-to-end after both recoveries
    val ests = Sketches.hllEstimates(spark.read.parquet(dir),
      Seq("key"), "est").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy("key").agg(countDistinct("user").as("nu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rsd = 1.04 / math.sqrt(4096.0)
    exact.foreach { case (key, nu) =>
      assert(math.abs(ests(key) - nu) <= 5 * rsd * nu + 1,
        s"post-recovery HLL bound broken for $key")
    }
  }

  test("grid state is bounded by k per shard, independent of shard size") {
    val root = Files.createTempDirectory("graft_sk").toString
    val k = 32
    Sketches.save(Sketches.quantilePartials(rows, "value", Seq("key"),
      lit(0), k), root, "qgrid", "t")
    val sizes = spark.read.parquet(s"$root/qgrid_t")
      .select(size(col("grid")).as("s"), col("n")).collect()
    sizes.foreach { r =>
      assert(r.getInt(0) <= k && r.getLong(1) > k,
        s"grid not bounded: ${r.getInt(0)} points for ${r.getLong(1)} rows")
    }
  }
}
