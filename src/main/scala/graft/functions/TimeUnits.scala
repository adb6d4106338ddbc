package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-unit conversions between the reference's declared time types
  * (src/core/sis_dynamic.h:77-91): W=µs, T=ms, S=sec, M=minute-of-epoch,
  * D=date int `20010101`, Y=year int. Total-function semantics per
  * `sis_time_unit_convert` (src/core/sis_dynamic.c:347-390), including
  * the corners:
  *   - D → ms maps a date to its *end of day* 23:59:59.999
  *     (sis_dynamic.c:382)
  *   - M → ms maps a minute to its last millisecond (+59999)
  * All are pure column expressions (UTC session timezone assumed, as
  * configured by the engine's sessions).
  */
object TimeUnits {
  private val MsPerDay = 86400000L

  /** yyyymmdd int from a timestamp/date column. */
  def dayInt(ts: Column): Column =
    (year(ts) * 10000 + month(ts) * 100 + dayofmonth(ts)).cast("int")

  /** D → T: yyyymmdd int to end-of-day epoch ms (23:59:59.999). */
  def dayIntToEodMs(d: Column): Column =
    unix_millis(to_timestamp(d.cast("string"), "yyyyMMdd")) + (MsPerDay - 1)

  /** D → T, start of day. */
  def dayIntToSodMs(d: Column): Column =
    unix_millis(to_timestamp(d.cast("string"), "yyyyMMdd"))

  /** M (minutes since epoch) → last ms of that minute (+59999). */
  def minuteToEodMs(m: Column): Column = m.cast("long") * 60000L + 59999L

  /** T → M (minutes since epoch), floor. */
  def msToMinute(ms: Column): Column = floor(ms / 60000L).cast("long")

  /** T → S, floor. */
  def msToSec(ms: Column): Column = floor(ms / 1000L).cast("long")

  /** S → T: *last* ms of the second (+999) — every coarse→fine
    * conversion in the reference maps to the END of the interval
    * (sis_time_unit_convert, sis_dynamic.c:356: `in64 * 1000 + 999`),
    * mirroring M→T (+59999) and D→T (23:59:59.999). */
  def secToMs(s: Column): Column = s.cast("long") * 1000L + 999L

  /** S → T, start-of-second (for round-trip flooring, not the
    * reference's conversion). */
  def secToSodMs(s: Column): Column = s.cast("long") * 1000L

  /** W (µs) → T (ms), floor. */
  def usToMs(us: Column): Column = floor(us / 1000L).cast("long")

  /** T → D: yyyymmdd int of the ms timestamp (UTC). */
  def msToDayInt(ms: Column): Column =
    dayInt(timestamp_millis(ms.cast("long")))

  /** T → Y: calendar year. */
  def msToYear(ms: Column): Column = year(timestamp_millis(ms.cast("long")))

  /** Y → T: first ms of the year. */
  def yearToSodMs(y: Column): Column =
    unix_millis(to_timestamp(concat(y.cast("string"), lit("0101")), "yyyyMMdd"))
}
