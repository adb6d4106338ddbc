package graft

import graft.functions.TimeUnits
import org.apache.spark.sql.functions._

/** Time-unit conversion corners per sis_time_unit_convert
  * (sis_dynamic.c:347-390): every coarse→fine conversion maps to the
  * END of the interval (S→T +999, M→T +59999, D→T 23:59:59.999);
  * fine→coarse floors. */
class TimeUnitsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  test("D→T end-of-day: 20210828 → 2021-08-28T23:59:59.999Z") {
    val expect = java.time.Instant.parse("2021-08-28T23:59:59.999Z").toEpochMilli
    assert(one[Long](TimeUnits.dayIntToEodMs(lit(20210828))) == expect)
  }

  test("S→T is end-of-second (*1000 + 999)") {
    assert(one[Long](TimeUnits.secToMs(lit(1630087372L))) == 1630087372999L)
  }

  test("M→T is end-of-minute (*60000 + 59999)") {
    assert(one[Long](TimeUnits.minuteToEodMs(lit(27168122L))) ==
      27168122L * 60000 + 59999)
  }

  test("T→S / T→M floor") {
    assert(one[Long](TimeUnits.msToSec(lit(1630087372999L))) == 1630087372L)
    assert(one[Long](TimeUnits.msToMinute(lit(1630087372999L))) ==
      1630087372999L / 60000)
  }

  test("roundtrips: coarse → end-of-interval ms → coarse is identity") {
    val seeds = new scala.util.Random(7)
    val days = Seq.fill(25)(20000101 + seeds.nextInt(90000)).distinct
      .filter(d => { val m = d / 100 % 100; val dd = d % 100
        m >= 1 && m <= 12 && dd >= 1 && dd <= 28 })
    val df = days.toDF("d")
    val back = df.select(
      TimeUnits.msToDayInt(TimeUnits.dayIntToEodMs(col("d"))).as("rt"),
      col("d")).collect()
    back.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"day ${r.getInt(1)} round-tripped to ${r.getInt(0)}"))
    // seconds and minutes
    val secs = Seq.fill(25)(math.abs(seeds.nextLong()) % 4000000000L).toDF("s")
    secs.select(TimeUnits.msToSec(TimeUnits.secToMs(col("s"))).as("rt"),
        col("s")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val mins = Seq.fill(25)(math.abs(seeds.nextLong()) % 60000000L).toDF("m")
    mins.select(TimeUnits.msToMinute(TimeUnits.minuteToEodMs(col("m"))).as("rt"),
        col("m")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("T→Y and Y→T first-ms") {
    assert(one[Int](TimeUnits.msToYear(lit(1630087372600L))) == 2021)
    assert(one[Long](TimeUnits.yearToSodMs(lit(2021))) ==
      java.time.Instant.parse("2021-01-01T00:00:00Z").toEpochMilli)
  }
}
