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
