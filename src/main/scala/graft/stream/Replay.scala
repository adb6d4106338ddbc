package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** T2 replay subscription (workers/snodb replay path, sisdb.c:491-546):
  * pump one stored day through a callback in time order —
  * START → rows → STOP, the reference's SUB_OPEN/SUB_WAIT protocol
  * (src/core/net/sis_net.msg.h:38-44).
  *
  * The read is a day-pruned partition scan (J1's k-way merge is the
  * `orderBy` — all keys' series interleave by time); delivery uses
  * `toLocalIterator` so only one partition is resident driver-side at
  * a time. A 100 TB engine replays *into* another job, not through a
  * driver callback — that path is just the ordered DataFrame below.
  */
object Replay {

  /** The ordered replay view (engine path — stays distributed). */
  def dayView(spark: SparkSession, storePath: String, day: String,
      timeCol: String, seqCol: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(storePath).filter(col("__day") === day)
    val order = col(timeCol).asc +: seqCol.map(col(_).asc).toSeq
    df.orderBy(order: _*)
  }

  /** Driver-side protocol pump — a CLIENT convenience, deliberately
    * single-threaded (one consumer, one ordered stream, like a client
    * socket). It is NOT the fan-out server shape: for serving many
    * subscribers use [[replayDayTo]], where per-subscriber filtering
    * runs distributed instead of squeezing every row through this one
    * driver iterator. Returns rows emitted. */
  def replayDay(spark: SparkSession, storePath: String, day: String,
      timeCol: String, seqCol: Option[String] = None)(
      onStart: => Unit = (), onRow: Row => Unit, onStop: => Unit = ()): Long = {
    onStart
    var n = 0L
    val it = dayView(spark, storePath, day, timeCol, seqCol).toLocalIterator()
    while (it.hasNext) { onRow(it.next()); n += 1 }
    onStop
    n
  }

  /** Server-shape fan-out replay (workers/snodb/snodb_reader.c:676-905:
    * dedicated per-subscriber reader threads re-filter the stored day
    * and re-deliver at their own pace): the day is replayed as
    * `slices` consecutive time-slices, each published through the
    * registry as a DISTRIBUTED frame. Per-subscriber filtering is a
    * Spark filter over the slice (the reference's re-filter step), so
    * subscriber count never multiplies driver egress; the slice is the
    * pacing unit (the reference paces by send-queue backpressure).
    * Slices partition [min, max] of the day's time column, so
    * every row is delivered exactly once, in slice order.
    * Returns rows replayed. */
  def replayDayTo(spark: SparkSession, storePath: String, day: String,
      timeCol: String, subjectCol: String, subs: SubRegistry,
      slices: Int = 24, seqCol: Option[String] = None,
      table: String = ""): Long =
    replayFrameTo(
      spark.read.parquet(storePath).filter(col("__day") === day),
      timeCol, subjectCol, subs, slices, seqCol, table)

  /** The fan-out core over an already day-scoped frame — the engine
    * path hands in its store's READ view here (tombstone-filtered,
    * hot∪cold), so a replay never resurrects dropped subjects. `table`
    * tags every publish so table-qualified sub patterns
    * (`subjects.tables`) match replayed rows exactly like live sets. */
  def replayFrameTo(dayFrame: DataFrame, timeCol: String,
      subjectCol: String, subs: SubRegistry, slices: Int = 24,
      seqCol: Option[String] = None, table: String = "",
      sliceExpr: Option[org.apache.spark.sql.Column] = None): Long = {
    require(slices > 0, "slices must be positive")
    // slicing needs the index as a long; a DateType index has no direct
    // long cast (ANSI), so callers with typed schemas pass their own
    // mapping (the engine hands in its style-aware indexAsLong)
    val sl = sliceExpr.getOrElse(col(timeCol).cast("long"))
    // a row without a time index is not replayable as a series (the
    // reference's main index is mandatory) — exclude it from delivery
    // AND from the returned count, so the exactly-once accounting holds
    val df = dayFrame.filter(col(timeCol).isNotNull)
    val stats = df.agg(min(sl).cast("long"),
      max(sl).cast("long"), count(lit(1))).collect()(0)
    if (stats.isNullAt(0) || stats.getLong(2) == 0L) return 0L
    val (lo, hi, total) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val width = math.max(1L, (hi - lo) / slices + 1)
    (0 until slices).foreach { i =>
      val (slo, shi) = (lo + i * width, lo + (i + 1) * width - 1)
      if (slo <= hi) {
        val order = col(timeCol).asc +: seqCol.map(col(_).asc).toSeq
        val slice = df
          .filter(sl.between(slo, shi))
          .orderBy(order: _*)
        subs.publish(slice, subjectCol, table)
      }
    }
    total
  }
}
