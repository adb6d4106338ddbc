package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: the Morton encoding is the real bit interleave, and
  * the z-layout's file stats prune a 2-D box that a 1-D sort cannot. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 == reference bit interleave for sampled ranks") {
    // reference: scatter a's bit i to 2i, b's bit i to 2i+1
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (43690L, 21845L))
    val got = samples.toDF("a", "b")
      .select(Layout.morton2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == samples.map((ref _).tupled),
      s"morton mismatch: $got vs ${samples.map((ref _).tupled)}")
  }

  test("z-order prunes a 2-D box; a 1-D sort's second dimension does not") {
    val dir = Files.createTempDirectory("graft_layout").toString
    // two independent uniform dims, enough rows for 16 stable files
    val rows = (0 until 4096).map { i =>
      val x = (i * 2654435761L) % 1024
      val y = (i * 40503L) % 1024
      (i.toLong, x, y.toDouble)
    }.toDF("id", "x", "y")
    Layout.zorderWrite(rows,
      Layout.uniformRank(col("x"), 0, 1023, 256),
      Layout.uniformRank(col("y"), 0, 1023, 256), s"$dir/z", 16)
    rows.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    val box = Seq(("x", 100.0, 200.0), ("y", 100.0, 200.0))
    val (zHit, zTot) = Layout.filesForBox(spark.read.parquet(s"$dir/z"), box)
    val (lHitY, _) = Layout.filesForBox(
      spark.read.parquet(s"$dir/linear"), Seq(("y", 100.0, 200.0)))
    // ~1% box: the z layout reads a small corner; the x-sorted layout
    // cannot skip ANY file on a y-only predicate (every file spans y)
    assert(zHit < zTot / 2, s"z-order read $zHit of $zTot files")
    assert(lHitY == 16, s"1-D layout unexpectedly pruned y: $lHitY")
    // correctness: the pruned scan loses no rows
    val want = rows.filter(col("x").between(100, 200) &&
      col("y").between(100, 200)).count()
    val got = spark.read.parquet(s"$dir/z")
      .filter(col("x").between(100, 200) && col("y").between(100, 200))
      .count()
    assert(got == want)
  }
}
