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

  /** Driver-side protocol pump (client surface). Returns rows emitted. */
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
}
