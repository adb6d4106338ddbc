package graft

import graft.ops.Trend
import org.apache.spark.sql.functions._

/** W4 nearest-trend semantics (sis_ai_nearest_drift_formerly,
  * sis_ai.c:661-787) on hand-computed fixtures, scalar and as the
  * grouped Aggregator. */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("falling tail: turn at the nearest high, dir=-1") {
    // rises 10..13 then falls to 12; last=12, nearest max beyond 2% is
    // index 3 (13, rate 8.3%), no lower min → DN from index 3
    val out = Trend.nearestDriftFormerly(
      Array(10, 11, 12, 13, 12.5, 12.0), 0, 0, 0.02)
    assert(out.dir == -1 && out.start == 3)
    assert(math.abs(out.rate - (12.0 - 13.0) / 12.0) < 1e-12)
    // normalized segment [13,12.5,12] -> [0.999,0.5,0.001], slope -0.499
    assert(math.abs(out.drift - -0.499) < 1e-9)
  }

  test("rising tail: turn at the nearest low, dir=1") {
    val out = Trend.nearestDriftFormerly(
      Array(13, 12, 11, 10, 11, 12.0), 0, 0, 0.02)
    assert(out.dir == 1 && out.start == 3)
    assert(math.abs(out.rate - (12.0 - 10.0) / 12.0) < 1e-12)
  }

  test("no move beyond minRate: dir=0, fit over whole series") {
    val out = Trend.nearestDriftFormerly(
      Array(100.0, 100.1, 100.05, 100.08, 100.02), 0, 0, 0.02)
    assert(out.dir == 0 && out.start == 0)
  }

  test("short or zero-tail series: MID") {
    assert(Trend.nearestDriftFormerly(Array(1.0, 2.0), 0, 0, 0.02).dir == 0)
    assert(Trend.nearestDriftFormerly(Array(1.0, 2.0, 0.0), 0, 0, 0.02).dir == 0)
  }

  test("aggregator over groups matches the scalar path") {
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 11.0), ("a", 3L, 12.0),
      ("a", 4L, 13.0), ("a", 5L, 12.5), ("a", 6L, 12.0),
      ("b", 1L, 13.0), ("b", 2L, 12.0), ("b", 3L, 11.0),
      ("b", 4L, 10.0), ("b", 5L, 11.0), ("b", 6L, 12.0))
      .toDF("subject", "k", "v")
    val tr = Trend.trendUdaf(0.02)
    val out = rows.groupBy("subject")
      .agg(tr(col("k"), col("v")).as("t"))
      .select("subject", "t.dir", "t.start")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out("a") == (-1, 3))
    assert(out("b") == (1, 3))
  }
}
