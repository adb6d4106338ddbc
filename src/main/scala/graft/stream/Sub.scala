package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T1 live pub/sub (workers/sisdb/sisdb.c:461-489; matcher
  * workers/sisdb_server/sisdb_sub.h:10-18): subscribers register a
  * subject pattern — exact (`SH600600`), prefix (`SH6*`) or the
  * wildcard `*` — and every ingested batch is fanned out filtered to
  * each subscriber's keys.
  *
  * The registry is plain in-process state (the reference's is too —
  * one dict per server, sisdb_sub.c); each publish is a filtered view
  * of the already-materialized micro-batch, so N subscribers cost N
  * filters over cached data, no extra scans of the source.
  */
final case class Subscription(id: String, patterns: Seq[String],
    callback: DataFrame => Unit)

final class SubRegistry {

  private val subs = new java.util.concurrent.ConcurrentHashMap[String, Subscription]()

  def subscribe(id: String, patterns: Seq[String])
      (callback: DataFrame => Unit): Unit =
    subs.put(id, Subscription(id, patterns, callback))

  def unsubscribe(id: String): Unit = subs.remove(id)

  /** sis_match_key semantics (src/core/sis_utils.h:58-73): `*` matches
    * all; a trailing `*` is a prefix match; otherwise exact; each
    * pattern element may itself be a comma list (`sub A,B.tb`,
    * sisdb.h:44-49) — one shared matcher with the store/engine. */
  private def matchCond(subjectCol: String, patterns: Seq[String]) =
    patterns.map(graft.store.KvStore.matchCond(subjectCol, _)).reduce(_ || _)

  /** Fan a published batch out to every matching subscriber. */
  def publish(batch: DataFrame, subjectCol: String): Unit =
    subs.values().forEach { s =>
      val matched = batch.filter(matchCond(subjectCol, s.patterns))
      s.callback(matched)
    }

  def size: Int = subs.size()
}
