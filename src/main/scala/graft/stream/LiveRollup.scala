package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Live incremental time-scale rollup — the streaming face of A1.
  *
  * The reference keeps ONE open bar per subject in memory, folds every
  * arriving tick into it, and finalizes the bar when a tick crosses the
  * bar boundary (workers/sisdb rollup path; the in-memory current-bar
  * state the `save` lifecycle flushes). The Spark-native shape for
  * exactly that state machine is `flatMapGroupsWithState`: key =
  * subject, state = the open bar, output = finalized bars only
  * (Append mode). State lives in the streaming state store, so it
  * survives micro-batch boundaries AND restarts from the checkpoint —
  * a bar whose ticks span batches or runs still comes out as one bar.
  *
  * Ordering: ticks are sorted by the caller-supplied unique key `k`
  * within each micro-batch (the iterator itself is unordered). Across
  * batches the feed is assumed ordered, exactly like the reference
  * (sis_db.h:71-76 — the feed contract); a cross-batch straggler for
  * the still-open bar folds into it (open/close keep their k-order
  * semantics), while one for an already-FINALIZED bar is dropped — it
  * can neither reopen the emitted bar nor be allowed to corrupt the
  * open bar's extremes with out-of-window values. The
  * watermark-windowed aggregation (st1) is the unordered-tolerant
  * alternative surface.
  */
object LiveRollup {

  final case class Tick(subject: String, k: Long, t: Long, v: Double)
  final case class OpenBar(barStart: Long, openK: Long, open: Double,
      high: Double, low: Double, closeK: Long, close: Double, n: Long)
  final case class Bar(subject: String, bar_start: Long, open: Double,
      high: Double, low: Double, close: Double, n: Long)

  /** One group's fold: sort the batch's ticks by k, roll them into the
    * open bar, emit every bar a boundary-cross finalizes. `dropped`
    * counts stragglers the fold refuses (see below) so a feed that
    * violates the ordering contract is observable, not silent. */
  private[stream] def fold(barMs: Long,
      dropped: Option[LongAccumulator] = None)(subject: String,
      rows: Iterator[Tick], state: GroupState[OpenBar]): Iterator[Bar] = {
    val sorted = rows.toIndexedSeq.sortBy(_.k)
    var st = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[Bar]
    sorted.foreach { tk =>
      val bs = tk.t - java.lang.Math.floorMod(tk.t, barMs)
      st match {
        case None =>
          st = Some(OpenBar(bs, tk.k, tk.v, tk.v, tk.v, tk.k, tk.v, 1L))
        case Some(s) if bs > s.barStart =>
          out += Bar(subject, s.barStart, s.open, s.high, s.low, s.close, s.n)
          st = Some(OpenBar(bs, tk.k, tk.v, tk.v, tk.v, tk.k, tk.v, 1L))
        case Some(s) if bs == s.barStart =>
          st = Some(OpenBar(s.barStart,
            if (tk.k < s.openK) tk.k else s.openK,
            if (tk.k < s.openK) tk.v else s.open,
            math.max(s.high, tk.v), math.min(s.low, tk.v),
            if (tk.k >= s.closeK) tk.k else s.closeK,
            if (tk.k >= s.closeK) tk.v else s.close,
            s.n + 1))
        case Some(_) =>
          // cross-batch straggler for an already-finalized bar: it can't
          // reopen the emitted bar, and folding its value into the OPEN
          // bar would report extremes from outside that bar's window —
          // drop it, keeping every emitted bar faithful to its window
          // (the feed contract is ordered anyway, sis_db.h:71-76).
          // COUNT the drop: a feed that violates the contract makes the
          // live rollup diverge from the batch recompute (A1/st1), and
          // that divergence must be observable, not silent.
          dropped.foreach(_.add(1L))
      }
    }
    st.foreach(state.update)
    out.iterator
  }

  /** Finalized-bar view over a (streaming or batch) frame with columns
    * (subject, k, t, v): k a unique ordering key, t epoch millis.
    * In batch mode the same code runs with no prior state — the batch
    * shadow for tests/oracles. The still-open last bar per subject is
    * never emitted (it finalizes when a later bar's tick arrives). */
  def finalizedBars(events: DataFrame, barMs: Long,
      droppedStragglers: Option[LongAccumulator] = None): Dataset[Bar] = {
    implicit val tickEnc: Encoder[Tick] = Encoders.product[Tick]
    implicit val stateEnc: Encoder[OpenBar] = Encoders.product[OpenBar]
    implicit val barEnc: Encoder[Bar] = Encoders.product[Bar]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val dropped = droppedStragglers.orElse(Some(
      events.sparkSession.sparkContext.longAccumulator(
        "liveRollup.droppedStragglers")))
    events.selectExpr("subject", "cast(k as long) k", "cast(t as long) t",
        "cast(v as double) v")
      .as[Tick]
      .groupByKey(_.subject)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        fold(barMs, dropped))
  }
}
