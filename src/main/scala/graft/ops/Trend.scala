package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** W4 trend-turn detection (s_ai_nearest_drift,
  * src/core/ai/sis_ai.h:68-120, sis_ai_nearest_drift_formerly
  * sis_ai.c:661-787): scan back from the latest point for the most
  * recent turn — the nearest earlier local extreme whose move against
  * the last value exceeds `minRate` — then fit a line over the
  * normalized [turn..last] segment. Returns (dir ∈ {-1,0,1}, start
  * index, actual rate, fitted slope).
  *
  * No Spark built-in computes this (it is a sequential scan with early
  * exit), so it is the one reference analytic that needs a custom
  * `Aggregator[IN, BUF, OUT]`: partials collect (orderKey, value) pairs
  * per subject, merge concatenates, and `finish` sorts once and runs
  * the O(n) scan — same per-series-in-memory model as the reference,
  * distributed per subject key.
  */
object Trend {

  final case class Point(k: Long, v: Double)
  final case class TrendOut(dir: Int, start: Int, rate: Double, drift: Double)

  private final val NormMin = 0.001 // SIS_AI_MIN
  private final val NormMax = 0.999 // SIS_AI_MAX

  /** Faithful port of the *semantics* of sis_ai_nearest_drift_formerly
    * (sis_ai.c:661-787) over an ordered series. */
  def nearestDriftFormerly(ins: Array[Double], min: Double, max: Double,
      minRate: Double): TrendOut = {
    val n = ins.length
    if (n < 3 || (ins(n - 1) < 0.00001 && ins(n - 1) > -0.00001))
      return TrendOut(0, 0, minRate, 0.0)
    val last = ins(n - 1)
    var minv = last; var maxv = last
    var mini = -1; var maxi = -1
    // nearest maximum beyond minRate (scan backwards, stop at first dip
    // after a candidate)
    var m = n - 2
    var break1 = false
    while (m >= 0 && !break1) {
      if (ins(m) > maxv) {
        maxv = ins(m)
        if ((maxv - last) / last > minRate) maxi = m
      } else if (maxi >= 0) break1 = true
      m -= 1
    }
    m = n - 2
    var break2 = false
    while (m >= 0 && !break2) {
      if (ins(m) < minv) {
        minv = ins(m)
        if ((last - minv) / last > minRate) mini = m
      } else if (mini >= 0) break2 = true
      m -= 1
    }
    var dir = 0
    var start = 0
    if (maxi >= 0 || mini >= 0) {
      if (maxi > mini) { start = maxi; dir = -1 } // falling from a high
      if (maxi < mini) { start = mini; dir = 1 }  // rising from a low
    }
    // linear fit over the normalized [start..n) segment
    val seg = java.util.Arrays.copyOfRange(ins, start, n)
    val (slope, intercept) = normalizedSlope(seg, min, max)
    val rate =
      if (start == 0) {
        val c = (max - min) * intercept / (NormMax - NormMin) + min
        (last - c) / last
      } else (last - ins(start)) / last
    TrendOut(dir, start, rate, slope)
  }

  /** min-max normalize to [0.001, 0.999] (self-scaled when min==max==0,
    * sis_ai_normalization_series_array) then least-squares slope over
    * x = 0..n-1 (sis_ai_polyfit degree 1). */
  private def normalizedSlope(seg: Array[Double], min0: Double,
      max0: Double): (Double, Double) = {
    val n = seg.length
    var mn = min0; var mx = max0
    if (mn == 0 && mx == 0) {
      mn = seg(0); mx = seg(0)
      var i = 1
      while (i < n) { mn = math.min(mn, seg(i)); mx = math.max(mx, seg(i)); i += 1 }
    }
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (mx <= mn || seg(i) <= mn) NormMin
        else if (seg(i) >= mx) NormMax
        else NormMin + (NormMax - NormMin) * (seg(i) - mn) / (mx - mn)
      i += 1
    }
    // least squares y = a + b x over x = 0..n-1
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0
    i = 0
    while (i < n) {
      sx += i; sy += out(i); sxx += i.toDouble * i; sxy += i * out(i)
      i += 1
    }
    val d = n * sxx - sx * sx
    if (d == 0) (0.0, if (n > 0) sy / n else 0.0)
    else ((n * sxy - sx * sy) / d, (sy * sxx - sx * sxy) / d)
  }

  // List[Point] needs a product wrapper for the tuple encoder
  final case class Points(points: List[Point])

  private class TrendAgg(minRate: Double)
      extends Aggregator[Point, Points, TrendOut] {
    override def zero: Points = Points(Nil)
    override def reduce(b: Points, a: Point): Points = Points(a :: b.points)
    override def merge(b1: Points, b2: Points): Points =
      Points(b1.points ::: b2.points)
    override def finish(b: Points): TrendOut = {
      val vals = b.points.sortBy(_.k).map(_.v).toArray
      nearestDriftFormerly(vals, 0.0, 0.0, minRate)
    }
    override def bufferEncoder: Encoder[Points] = Encoders.product[Points]
    override def outputEncoder: Encoder[TrendOut] = Encoders.product[TrendOut]
  }

  /** Aggregate column: `trend(orderKey, value)` under a groupBy. */
  def trendUdaf(minRate: Double): org.apache.spark.sql.expressions
      .UserDefinedFunction = udaf(new TrendAgg(minRate), Encoders.product[Point])
}
