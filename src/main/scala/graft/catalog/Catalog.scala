package graft.catalog

import graft.schema.SdbSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** U1 engine registry + T5 dict-stream support.
  *
  * The reference keeps a runtime dictionary of table schemas ("sdbs")
  * and, for compressed streams, dense integer dictionaries mapping
  * key/table names ↔ ids so binary rows travel as (kidx, sidx,
  * payload) (workers/sisdb_server/sisdb_incr.h:44-49,
  * sis_net.msg.h:38-44). Here: a plain registry of [[SdbSchema.Sdb]]
  * plus broadcast-join-able dictionary dims (J3).
  */
final class Catalog extends Serializable {
  private val sdbs = scala.collection.concurrent.TrieMap[String, SdbSchema.Sdb]()

  def register(sdb: SdbSchema.Sdb): Unit = sdbs.put(sdb.name, sdb)
  def register(dsl: String): SdbSchema.Sdb = {
    val s = SdbSchema.parse(dsl)
    register(s); s
  }
  def get(name: String): Option[SdbSchema.Sdb] = sdbs.get(name)
  def tables: Seq[String] = sdbs.keys.toSeq.sorted
}

object Catalog {

  /** Dense-id dictionary over a name column: deterministic ids by
    * sorted order. Ranking is [[graft.ops.Analytics.globalRowNumber]]
    * (range-partitioned two-pass), not a global window — a vocabulary
    * dictionary can be hundreds of millions of names at 100 TB. */
  def dictionary(df: DataFrame, nameCol: String,
      idCol: String = "id"): DataFrame =
    graft.ops.Analytics.globalRowNumber(
      df.select(col(nameCol)).distinct(), Seq(col(nameCol)), idCol)
      .withColumn(idCol, col(idCol).cast("int"))

  /** Replace names with dictionary ids (encode side of the dict
    * stream): broadcast hash join, no shuffle of the big side. */
  def encode(df: DataFrame, dict: DataFrame, nameCol: String,
      idCol: String = "id"): DataFrame =
    df.join(broadcast(dict), Seq(nameCol)).drop(nameCol)

  /** Resolve ids back to names (decode side). */
  def decode(df: DataFrame, dict: DataFrame, nameCol: String,
      idCol: String = "id"): DataFrame =
    df.join(broadcast(dict), Seq(idCol)).drop(idCol)
}
