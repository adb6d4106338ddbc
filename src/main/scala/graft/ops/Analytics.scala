package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Series analytics — the reference's "ai" module (src/core/ai/sis_ai.h,
  * sis_ai_corr.h) re-expressed as window/aggregate expressions so every
  * series is computed inside one shuffle partition per subject.
  */
object Analytics {

  /** W1 slope at a point: first difference over the partition order
    * (sis_ai_series_drift, src/core/ai/sis_ai.h:35-36). */
  def drift(value: Column, w: WindowSpec): Column =
    value - lag(value, 1).over(w)

  /** W2 acceleration: second difference (sis_ai.h:37-38). */
  def accel(value: Column, w: WindowSpec): Column =
    value - lit(2) * lag(value, 1).over(w) + lag(value, 2).over(w)

  /** A6 min-max normalization to [0,1] within a group
    * (sis_ai_normalization, sis_ai.h:20-33). The reference squeezes to
    * [0.001, 0.999]; `margin` reproduces that when needed.
    *
    * Scale note: computed as a groupBy(min, max) + broadcast join back,
    * NOT a window partitioned by the group columns — a low-cardinality
    * group column (5 priorities) would otherwise funnel the whole table
    * through 5 window partitions. The extremes table is tiny (one row
    * per group) so the join is a broadcast; the big side never shuffles.
    */
  def minMaxNorm(df: DataFrame, value: String, groupCols: Seq[String],
      out: String, margin: Double = 0.0): DataFrame = {
    val extremes = df.groupBy(groupCols.map(col): _*)
      .agg(min(col(value)).as("__mn"), max(col(value)).as("__mx"))
    val raw = (col(value) - col("__mn")) / (col("__mx") - col("__mn"))
    val scaled =
      if (margin == 0.0) raw
      else raw * (1 - 2 * margin) + margin
    df.join(broadcast(extremes), groupCols)
      .withColumn(out, when(col("__mx") === col("__mn"), lit(0.5)).otherwise(scaled))
      .drop("__mn", "__mx")
  }

  /** A6 split normalization (sis_ai_normalization_split,
    * sis_ai.h:30-33): values below `mid` map to [0.001, 0.5), above to
    * (0.5, 0.999], `mid` itself to 0.5 — a mid-anchored squeeze (e.g.
    * yesterday's close as the anchor). Same agg + broadcast-join shape
    * as [[minMaxNorm]]. */
  def minMaxNormSplit(df: DataFrame, value: String, mid: Column,
      groupCols: Seq[String], out: String): DataFrame = {
    val extremes = df.groupBy(groupCols.map(col): _*)
      .agg(min(col(value)).as("__mn"), max(col(value)).as("__mx"))
    val v = col(value)
    val lo = 0.001; val hi = 0.999; val half = 0.5
    val below = lit(lo) + (v - col("__mn")) / (mid - col("__mn")) * (half - lo)
    val above = lit(half) + (v - mid) / (col("__mx") - mid) * (hi - half)
    df.join(broadcast(extremes), groupCols)
      .withColumn(out,
        when(v === mid, half)
          .when(v < mid, when(col("__mn") >= mid, lo).otherwise(
            greatest(lit(lo), below)))
          .otherwise(when(col("__mx") <= mid, hi).otherwise(
            least(lit(hi), above))))
      .drop("__mn", "__mx")
  }

  /** A5 plain trailing-window mean (the windowed-average shape). */
  def runningAvg(value: Column, w: WindowSpec, n: Int): Column =
    avg(value).over(w.rowsBetween(-(n - 1), 0))

  /** A5 faithful damped incremental average (sis_ai_calc_avgm,
    * src/core/ai/sis_ai.c:358-383): sequential over the series, zero
    * samples skipped (SIS_IS_ZERO, sis_math.h:8,18 → |v| < 1e-7);
    * 1st sample seeds; samples 2..9 damp by a fixed 1/10 weight;
    * 10..99 are an exact running mean; >=100 a fixed 1/100 weight.
    *
    * Order-dependent, so it folds over the collected per-subject series
    * (sorted by `orderKey`) — same single-series-in-memory assumption
    * the reference makes; per-subject series, so it distributes by
    * subject. Returns one row per group with the final avgm.
    */
  def dampedAvg(df: DataFrame, groupCols: Seq[String], orderKey: Column,
      value: Column, out: String = "avgm"): DataFrame = {
    val series = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(orderKey.as("k"), value.as("v"))))
        .as("__s"))
    val zero = struct(lit(0).cast("int").as("nums"), lit(0.0).as("avgm"))
    val folded = aggregate(
      col("__s"), zero,
      (acc, x) => {
        val v = x.getField("v")
        val nums = acc.getField("nums")
        val avgm = acc.getField("avgm")
        val skip = abs(v) < lit(1e-7) // SIS_IS_ZERO
        val next = when(nums === 0,
            struct(lit(1).cast("int").as("nums"), v.as("avgm")))
          .when(nums < 10,
            struct((nums + 1).cast("int").as("nums"),
              ((avgm * 9 + v) / 10).as("avgm")))
          .when(nums < 100,
            struct((nums + 1).cast("int").as("nums"),
              ((avgm * nums + v) / (nums + 1)).as("avgm")))
          .otherwise(
            struct(nums.cast("int").as("nums"),
              ((avgm * 99 + v) / 100).as("avgm")))
        when(skip, acc).otherwise(next)
      })
    series.withColumn(out, folded.getField("avgm"))
      .withColumn("n_used", folded.getField("nums"))
      .drop("__s")
  }

  /** A5 faithful damped ratio average (sis_ai_calc_avgr,
    * src/core/ai/sis_ai.c:385-422): sequential over (son, mom) pairs —
    * skips zero mom (and zero son while warming up); tracks a damped
    * mean of son and a son-weighted damped mean of the ratio son/mom.
    * Same fold shape as [[dampedAvg]]. Returns one row per group with
    * avgm (mean numerator) and avgr (weighted ratio). */
  def dampedRatio(df: DataFrame, groupCols: Seq[String], orderKey: Column,
      son: Column, mom: Column): DataFrame = {
    val series = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(orderKey.as("k"), son.as("s"),
        mom.as("m")))).as("__s"))
    val zero = struct(lit(0).cast("int").as("nums"),
      lit(0.0).as("avgm"), lit(0.0).as("avgr"))
    val folded = aggregate(
      col("__s"), zero,
      (acc, x) => {
        val sv = x.getField("s"); val mv = x.getField("m")
        val nums = acc.getField("nums")
        val avgm = acc.getField("avgm"); val avgr = acc.getField("avgr")
        val skip = abs(mv) < 1e-7 || (abs(sv) < 1e-7 && nums < 10)
        val newv = sv / mv
        def step(w: Column, nextNums: Column) = {
          val newm = avgm * w + sv
          struct(nextNums.cast("int").as("nums"),
            (newm / (w + 1)).as("avgm"),
            ((avgm * w) / newm * avgr + sv / newm * newv).as("avgr"))
        }
        val next = when(nums === 0,
            struct(lit(1).cast("int").as("nums"), sv.as("avgm"), newv.as("avgr")))
          .when(nums < 10, step(lit(9.0), nums + 1))
          .when(nums < 100, step(nums.cast("double"), nums + 1))
          .otherwise(step(lit(99.0), nums))
        when(skip, acc).otherwise(next)
      })
    series
      .withColumn("avgm", folded.getField("avgm"))
      .withColumn("avgr", folded.getField("avgr"))
      .withColumn("n_used", folded.getField("nums"))
      .drop("__s")
  }

  /** W6 max-correlation lag search (sis_ai_corrcoef_offset/max,
    * src/core/ai/sis_ai_corr.h:17-21): Pearson correlation of two
    * aligned series evaluated at each relative offset 0..maxLag.
    * Returns (offset, corr) rows. Each lag is one window shift + one
    * aggregate; series are grouped per `orderCol` so the whole scan is
    * a single job with `maxLag+1` aggregations.
    */
  def lagCorr(df: DataFrame, x: String, y: String, orderCol: String,
      maxLag: Int): DataFrame = {
    // the input is one ALIGNED series (post-aggregation, bounded by the
    // calendar — days/minutes, not raw rows): the sequential window is
    // deliberate, see [[tinySeqW]]
    val w = tinySeqW.orderBy(col(orderCol))
    val withLags = (0 to maxLag).foldLeft(df) { (d, k) =>
      d.withColumn(s"__y_$k", if (k == 0) col(y) else lag(col(y), k).over(w))
    }
    // ONE aggregation computes every lag's corr (one scan of the input),
    // then stack() unpivots the single row into (offset, corr_xy) rows —
    // vs one full re-scan per lag.
    val aggd = withLags.agg(
      corr(col(x), col("__y_0")).as("__c0"),
      (1 to maxLag).map(k => corr(col(x), col(s"__y_$k")).as(s"__c$k")): _*)
    val stackArgs = (0 to maxLag).map(k => s"$k, __c$k").mkString(", ")
    aggd.select(expr(
      s"stack(${maxLag + 1}, $stackArgs) as (offset, corr_xy)"))
  }

  /** W6 best-offset search with the reference's greedy walk
    * (sis_ai_corrcoef_offset, sis_ai_corr.c:39-60): start at offset 0,
    * advance while the correlation keeps improving (>=), stop at the
    * first decrease; maxLag additionally capped at size·0.382+1 by the
    * caller. The per-lag table is a (maxLag+1)-row aggregate, so the
    * walk is a driver-side scan of a scalar result, not of data. */
  def lagCorrBest(df: DataFrame, x: String, y: String, orderCol: String,
      maxLag: Int): (Int, Double) = {
    // corr() is null for zero-variance or <2 overlapping points (short
    // or constant series): treat a null at offset 0 as "no correlation"
    // and a null mid-walk as a stop, never calling getDouble on it.
    val rows = lagCorr(df, x, y, orderCol, maxLag)
      .collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    var best = rows.getOrElse(0, None).getOrElse(Double.NaN)
    var bestOff = 0
    var i = 1
    var stop = best.isNaN
    while (i <= maxLag && !stop) {
      rows.getOrElse(i, None) match {
        case Some(c) if c >= best => best = c; bestOff = i
        case _ => stop = true
      }
      i += 1
    }
    (bestOff, best)
  }

  /** W7 sign/direction correlation (sis_ai_corr_dir,
    * src/core/ai/sis_ai_corr.c:71-92): over paired series of *changes*,
    * `sames` = rows where both move up or both move down (beyond the
    * 1e-8 dead zone), `diffs` = the rest; result is
    * ((max-side ratio) - 0.5) * 2 with sames==diffs → 0. Returns an
    * aggregate Column usable under groupBy.
    */
  def dirCorr(x: Column, y: Column): Column = {
    val minv = 1e-8
    val same = (x > minv && y > minv) || (x < -minv && y < -minv)
    val sames = sum(when(same, 1).otherwise(0)).cast("double")
    val total = count(when(x.isNotNull && y.isNotNull, 1)).cast("double")
    val diffs = total - sames
    val ratio = when(sames > diffs, sames / total).otherwise(-diffs / total)
    when(sames === diffs, 0.0).otherwise((ratio - 0.5) * 2.0)
  }

  /** A7 bucketing (s_sis_groups, src/core/sis_group.h:35-111): assign
    * each row to one of `n` equal-frequency buckets over a total order —
    * exact `ntile` semantics without the single-partition global window.
    *
    * Plan: range-repartition on the order key (each partition holds a
    * contiguous key range), rank locally per partition, then add
    * per-partition offsets (a tiny #partitions-row table, broadcast).
    * The global rank is exact because the order is total; `ntile`'s
    * bucket arithmetic (first N%n buckets one row larger) is then a
    * scalar formula. Scales to any size: no stage sees more than one
    * partition's rows.
    */
  def buckets(df: DataFrame, n: Int, order: Seq[Column], out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(order: _*)
    val local = ranged.withColumn("__lrn", row_number().over(localW))
    val counts = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offs = counts
      .withColumn("__off", coalesce(sum("__cnt").over(
        tinySeqW.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total", sum("__cnt").over(
        tinySeqW.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__off", "__total")
    val rank = col("__off") + col("__lrn") // 1-based global rank
    val base = (col("__total") / n).cast("long")
    val rem = col("__total") % n
    val bucket = when(rank <= rem * (base + 1),
        ((rank - 1) / (base + 1)).cast("long") + 1)
      .otherwise(rem + ((rank - 1 - rem * (base + 1)) / base).cast("long") + 1)
    local.join(broadcast(offs), "__pid")
      .withColumn(out, bucket.cast("int"))
      .drop("__pid", "__lrn", "__off", "__total")
  }

  /** A8 top-K ranked set (s_sis_fgroup, sis_group.h:54-133): planned as
    * TakeOrderedAndProject — per-partition heaps, only K rows move. */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** A window over a PROVABLY TINY table (one row per shuffle partition,
    * or a post-aggregation series bounded by the calendar). The constant
    * partition key documents INTENT only: Spark 4.1's
    * `EliminateWindowPartitions` rule strips foldable partition keys,
    * so this executes as exactly the global window it annotates (and
    * logs `WindowExec: No Partition Defined` — expected, not a scale
    * bug: every consumer's input is dial- or calendar-bounded; see
    * PLANS.md "global-window warnings"). */
  private[graft] def tinySeqW =
    Window.partitionBy(lit(0))

  /** Exact 1-based global row number over a total order WITHOUT a
    * single-partition window: range-repartition on the order key (each
    * partition holds a contiguous range), rank locally, then add
    * per-partition offsets (a #partitions-row table, broadcast). Exact
    * because the order is total across range partitions; scales to any
    * size — no stage sees more than one partition's rows. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(order: _*)
    val local = ranged.withColumn("__lrn", row_number().over(localW))
    val counts = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offs = counts
      .withColumn("__off", coalesce(sum("__cnt").over(
        tinySeqW.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offs), "__pid")
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
