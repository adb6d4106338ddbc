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

  /** Scalar sis_match_key over a comma list — the table side of a
    * `subjects.tables` pattern is matched per publish, not per row. */
  private def scalarMatch(pattern: String, v: String): Boolean =
    pattern.split(",").map(_.trim).filter(_.nonEmpty).exists {
      case "*" => true
      case p if p.endsWith("*") => v.startsWith(p.dropRight(1))
      case p => v == p
    }

  /** A pattern is `subjects` (any table) or `subjects.tables` — the
    * reference's full sub key shape (`sub SH600600,SH600601
    * .stk_snapshot,stk_trancat`, workers/sisdb/sisdb.h:44-49). */
  private def splitPattern(p: String): (String, String) = {
    val i = p.lastIndexOf('.')
    if (i > 0) (p.substring(0, i), p.substring(i + 1)) else (p, "*")
  }

  /** Fan a published batch out to every matching subscriber. `table`
    * is the publishing table's name; subscribers with table-qualified
    * patterns only see tables they asked for. A publisher without
    * table context (`""`) matches every pattern's table side. */
  def publish(batch: DataFrame, subjectCol: String, table: String = ""): Unit =
    subs.values().forEach { s =>
      val applicable = s.patterns.map(splitPattern).collect {
        case (subj, tabs) if table.isEmpty || scalarMatch(tabs, table) => subj
      }
      if (applicable.nonEmpty) {
        val matched = batch.filter(matchCond(subjectCol, applicable))
        s.callback(matched)
      }
    }

  def size: Int = subs.size()
}
