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

  // ── incremental rollup maintenance ─────────────────────────────
  //
  // A stored daily rollup over a 100 TB event stream cannot be
  // recomputed from scratch per ingest batch. OHLCV partials are
  // CLOSED under merge once each bar carries the order keys of its
  // first and last row: open-of-min-first-key, max-high, min-low,
  // close-of-max-last-key, sums — so per-batch partials land in
  // replay-idempotent batch slots ([[Sketches.appendBatch]], the
  // st8/x7 contract: O(batch) work per arrival, the stored state
  // never rewrites) and any read merges the slots. Slot accretion is
  // bounded by [[compactBarPartialBatches]]: merge-of-merges equals
  // the one-shot merge (the carried keys make it associative), so
  // compaction is exact, not an approximation.

  /** Mergeable OHLCV partials per (groupCols, batch): the [[ohlc]]
    * aggregate plus the first/last order keys that make bars
    * re-mergeable. Schema: groups..., first_k, open, high, low,
    * close, last_k, cnt, volume. */
  def ohlcPartials(df: DataFrame, groupCols: Seq[Column],
      orderKey: Column, value: Column, volume: Column): DataFrame =
    df.groupBy(groupCols: _*).agg(
      min(orderKey).as("first_k"),
      min_by(value, orderKey).as("open"),
      max(value).as("high"),
      min(value).as("low"),
      max_by(value, orderKey).as("close"),
      max(orderKey).as("last_k"),
      count(lit(1)).as("cnt"),
      sum(volume).as("volume"))

  /** Merge partials (across batch slots or shards) into partials of
    * the union — same schema in and out, so merge composes. */
  def mergeBarPartials(partials: DataFrame,
      groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*).agg(
      min(col("first_k")).as("first_k"),
      min_by(col("open"), col("first_k")).as("open"),
      max(col("high")).as("high"),
      min(col("low")).as("low"),
      max_by(col("close"), col("last_k")).as("close"),
      max(col("last_k")).as("last_k"),
      sum(col("cnt")).as("cnt"),
      sum(col("volume")).as("volume"))

  /** Read-side finalize: merge the stored slots and drop the
    * maintenance keys — the result is [[ohlc]]'s bar schema. */
  def finalizeBars(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    mergeBarPartials(partials, groupCols)
      .drop("first_k", "last_k")

  /** Fold rollup-partial batch slots ≤ `upTo` into one (the
    * [[Sketches]] stage→marker→apply compactor): the consolidated
    * slot is [[mergeBarPartials]] of the in-scope slots, which the
    * carried order keys make EXACTLY equal to partials built from the
    * union — compaction costs zero accuracy, picked fields are
    * bit-identical and sums reassociate within float ulps. */
  def compactBarPartialBatches(ss: org.apache.spark.sql.SparkSession,
      root: String, stamp: String, upTo: Long, groupCols: Seq[String],
      kind: String = "ohlc"): Int = {
    // explicit group columns: inferring them by excluding the reserved
    // partial-field names would silently aggregate away a group column
    // that happens to be NAMED e.g. "open" or "cnt" — the caller knows
    // its grouping (finalizeBars already takes it), so require it here
    // and refuse the ambiguous collision outright
    val reserved = Set("first_k", "open", "high", "low", "close",
      "last_k", "cnt", "volume")
    val clash = groupCols.filter(reserved.contains)
    require(clash.isEmpty, s"group columns ${clash.mkString(", ")} " +
      "collide with reserved OHLC partial field names — rename them " +
      "before storing partials")
    Sketches.compactBatches(ss, root, kind, stamp, upTo) { src =>
      val missing = groupCols.filterNot(src.columns.contains)
      require(missing.isEmpty, s"stored partials lack group columns " +
        s"${missing.mkString(", ")} (have ${src.columns.mkString(", ")})")
      mergeBarPartials(src, groupCols).select(src.columns.map(col): _*)
    }
  }
}
