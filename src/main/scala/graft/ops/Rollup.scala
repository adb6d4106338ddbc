package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-scale rollup: finer bars feed coarser bars (the reference's
  * "数据层级" auto-aggregation, workers/sisdb/sisdb.h:36-42,57-61 and
  * README1.MD: a tick/minute write propagates to the day bar).
  *
  * Spark-first: a single `groupBy(subject, bucket)` with map-side
  * partial aggregation — open/close are `min_by`/`max_by` on a total
  * order key (time + ingest tiebreak) so ties resolve deterministically,
  * which the reference gets for free from its insertion order
  * (sisdb_fmap_write.c:374-385).
  */
object Rollup {

  /** OHLCV bars: group `df` by (groupCols..., bucket) and compute
    * open/high/low/close/volume/cnt over `value`.
    *
    * @param orderKey a total-order column (e.g. epoch-ms * 1e6 + seq)
    *                 deciding which row is "first"/"last" in the bucket
    */
  def ohlc(
      df: DataFrame,
      groupCols: Seq[Column],
      orderKey: Column,
      value: Column,
      volume: Option[Column] = None): DataFrame = {
    val aggs = Seq(
      min_by(value, orderKey).as("open"),
      max(value).as("high"),
      min(value).as("low"),
      max_by(value, orderKey).as("close"),
      count(lit(1)).as("cnt")) ++
      volume.map(v => sum(v).as("volume")).toSeq
    df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Roll daily bars up from finer bars: same-name OHLC fields compose
    * (open-of-first, max-of-high, min-of-low, close-of-last, sum-of-vol).
    */
  def rollUpBars(
      bars: DataFrame,
      groupCols: Seq[Column],
      orderKey: Column): DataFrame =
    bars.groupBy(groupCols: _*).agg(
      min_by(col("open"), orderKey).as("open"),
      max(col("high")).as("high"),
      min(col("low")).as("low"),
      max_by(col("close"), orderKey).as("close"),
      sum(col("volume")).as("volume"))
}
