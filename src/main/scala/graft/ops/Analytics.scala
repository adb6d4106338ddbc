package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series analytics — the reference's "ai" module (src/core/ai/sis_ai.h,
  * sis_ai_corr.h) re-expressed as window/aggregate expressions so every
  * series is computed inside one shuffle partition per subject.
  */
object Analytics {

  /** W1 slope at a point: first difference over the partition order
    * (sis_ai_series_drift, src/core/ai/sis_ai.h:35-36). */
  def drift(value: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    value - lag(value, 1).over(w)

  /** W2 acceleration: second difference (sis_ai.h:37-38). */
  def accel(value: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    value - lit(2) * lag(value, 1).over(w) + lag(value, 2).over(w)

  /** A6 min-max normalization to [0,1] within a group
    * (sis_ai_normalization, sis_ai.h:20-33). The reference squeezes to
    * [0.001, 0.999]; `margin` reproduces that when needed. */
  def minMaxNorm(df: DataFrame, value: String, groupCols: Seq[String],
      out: String, margin: Double = 0.0): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val mn = min(col(value)).over(w)
    val mx = max(col(value)).over(w)
    val raw = (col(value) - mn) / (mx - mn)
    val scaled =
      if (margin == 0.0) raw
      else raw * (1 - 2 * margin) + margin
    df.withColumn(out, when(mx === mn, lit(0.5)).otherwise(scaled))
  }

  /** A5 bounded running mean (sis_ai_calc_avgm, sis_ai.h:47-66): plain
    * windowed average over the trailing `n` rows. */
  def runningAvg(value: Column, w: org.apache.spark.sql.expressions.WindowSpec,
      n: Int): Column =
    avg(value).over(w.rowsBetween(-(n - 1), 0))

  /** W6 max-correlation lag search (sis_ai_corrcoef_offset/max,
    * src/core/ai/sis_ai_corr.h:17-21): Pearson correlation of two
    * aligned series evaluated at each relative offset 0..maxLag.
    * Returns (offset, corr) rows. Each lag is one window shift + one
    * aggregate; series are grouped per `orderCol` so the whole scan is
    * a single job with `maxLag+1` aggregations.
    */
  def lagCorr(df: DataFrame, x: String, y: String, orderCol: String,
      maxLag: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    val withLags = (0 to maxLag).foldLeft(df) { (d, k) =>
      d.withColumn(s"__y_$k", if (k == 0) col(y) else lag(col(y), k).over(w))
    }
    val spark = df.sparkSession
    val rows = (0 to maxLag).map { k =>
      withLags.agg(lit(k).as("offset"), corr(col(x), col(s"__y_$k")).as("corr_xy"))
    }
    rows.reduce(_ unionByName _)
  }

  /** A7 bucketing (s_sis_groups, src/core/sis_group.h:35-111): assign
    * each row to one of `n` equal-frequency buckets; deterministic via a
    * total order. */
  def buckets(df: DataFrame, n: Int, order: Seq[Column], out: String): DataFrame =
    df.withColumn(out, ntile(n).over(Window.orderBy(order: _*)))

  /** A8 top-K ranked set (s_sis_fgroup, sis_group.h:54-133). */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)
}
