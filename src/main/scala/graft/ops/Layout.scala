package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * file-level min/max statistics prune on SEVERAL columns at once.
  *
  * A sort lays data out well for ONE leading column: parquet min/max
  * ranges are narrow on it and every other column's per-file range
  * spans the whole domain, so a predicate on a non-leading column
  * prunes nothing. Interleaving the bits of two bucketed dimensions
  * puts rows that are close in BOTH dimensions into the same files:
  * each file covers a small square of the (x, y) space instead of a
  * thin full-width stripe, and a 2-D box predicate skips every file
  * whose square misses the box. This is the layout lever behind
  * "OPTIMIZE ZORDER BY" in lakehouse engines, built here from Spark
  * primitives only: bucketing + codegen'd bitwise Morton encoding +
  * `repartitionByRange` on the z-value, so it distributes like any
  * other shuffle-and-write (no driver-side pass, no UDF).
  *
  * At 100 TB the point is scan economics: a petabyte-scale events
  * table queried by (user, time) OR (metric, time) boxes reads only
  * the files whose z-square intersects the box — the same file-listing
  * + footer-stats machinery every parquet reader already has, no
  * secondary index to build or keep consistent.
  */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions 0,2,4,…,30
    * (the classic Morton magic-mask ladder) — pure bitwise Column
    * algebra, whole-stage-codegen friendly. */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton code of two 16-bit bucket ranks: bits of `a` on even
    * positions, bits of `b` on odd. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Uniform bucket rank of `c` in [0, buckets) given the dimension's
    * [lo, hi] — the cheap rank for roughly uniform dimensions (two
    * scalars per dimension, no extra pass). For skewed dimensions use
    * [[Analytics.buckets]] (exact quantile ranks, one extra
    * range-partitioned pass) and feed its bucket column in instead —
    * the z-encoding is rank-agnostic. */
  def uniformRank(c: Column, lo: Double, hi: Double, buckets: Int): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(greatest(
        floor((c.cast("double") - lit(lo)) / lit(span) * lit(buckets)),
        lit(0)), lit(buckets - 1)).cast("long")
  }

  /** Write `df` z-ordered on two rank columns: Morton-encode, range
    * partition into `files` output files on the z-value, sort within
    * partitions, drop the scaffolding. Each output file then covers a
    * compact square of (rankA, rankB) space, which is what makes the
    * per-file min/max of BOTH underlying columns selective. */
  def zorderWrite(df: DataFrame, rankA: Column, rankB: Column,
      path: String, files: Int): Unit =
    df.withColumn("__z", morton2(rankA, rankB))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) of `dims` for the files at `path` — the same
    * footer statistics a parquet reader prunes with, surfaced as a
    * frame so callers can PROVE a layout's selectivity (count the
    * files a box predicate must read) instead of asserting it. */
  def fileStats(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = dims.flatMap(d =>
      Seq(min(d).as(s"${d}_mn"), max(d).as(s"${d}_mx")))
    df.groupBy(col("_metadata.file_name").as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** How many of `path`'s files a box predicate must read, by the
    * file stats: files whose [mn, mx] intersects [lo, hi] on EVERY
    * dimension. This is exactly the file-skipping decision an engine
    * makes from footers; bounded driver work (one row per file). */
  def filesForBox(df: DataFrame, box: Seq[(String, Double, Double)])
      : (Int, Int) = {
    val stats = fileStats(df, box.map(_._1))
    val hit = box.map { case (d, lo, hi) =>
      col(s"${d}_mx") >= lit(lo) && col(s"${d}_mn") <= lit(hi)
    }.reduce(_ && _)
    val rows = stats.select(count(lit(1)).as("total"),
      sum(when(hit, 1).otherwise(0)).as("hit")).collect()(0)
    (rows.getLong(1).toInt, rows.getLong(0).toInt)
  }
}
