package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's unstructured key styles (SIS_SDB_STYLE_ONE / MUL,
  * src/core/disk/sis_disk.io.h:206-210) and the degenerate built-in
  * tables (disk/readme.md): `string {index, value}`, `factor
  * {time:T, value:F8}` (auto-created by `fset 00001.macd 12.60`),
  * jsons/bytes variants — all one generic KV DataFrame
  * `(key, seq, value)` per SURVEY §1.4.
  */
object KvStore {

  /** ONE style: single value per key — last write wins. */
  def setOne(kv: DataFrame, key: String, value: org.apache.spark.sql.Column,
      seq: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("seq").desc)
    kv.unionByName(
        kv.sparkSession.range(1).select(lit(key).as("key"),
          seq.as("seq"), value.as("value")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  def getOne(kv: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("seq").desc)
    kv.filter(col("key") === key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MUL style: ordered list per key. */
  def getMul(kv: DataFrame, key: String): DataFrame =
    kv.filter(col("key") === key).orderBy("seq")

  /** `fset`-shaped factor series: (subject, time, value) — a plain
    * DataFrame; `fget` = time-range filter per subject. */
  def factorSet(existing: Option[DataFrame], rows: DataFrame): DataFrame =
    existing.fold(rows)(_ unionByName rows)

  def factorGet(factors: DataFrame, subject: String,
      fromMs: Long, toMs: Long): DataFrame =
    factors.filter(col("subject") === subject &&
      col("time").between(fromMs, toMs)).orderBy("time")

  /** `sis_match_key` condition (src/core/sis_utils.h:58-73) plus the
    * command surface's comma lists (`SH600600,SH600601.stk_day`,
    * workers/sisdb/sisdb.h:44-49): `*` matches all, a trailing `*` is
    * a prefix match, otherwise exact; a comma list ORs its elements.
    * An all-exact list compiles to ONE `isin` so the pushed data
    * filter is a single `In(subject, [...])`, not an Or chain.
    *
    * DELIBERATE divergence from the cited reference matcher
    * (sis_str_subcmp, sis_utils.c:579): that one is case-INsensitive
    * and treats every element as an implicit prefix, so `u1` would
    * match `u10` — surprising for exact-key commands and wrong for
    * the multikey queries oracled here (e2). Prefix matching is
    * opt-in via a trailing `*`; keys compare case-sensitively like
    * every other Spark string. */
  def matchCond(subject: String, pattern: String): org.apache.spark.sql.Column = {
    val parts = pattern.split(",").map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty, s"empty key pattern '$pattern'")
    if (parts.contains("*")) lit(true)
    else if (parts.forall(!_.endsWith("*")))
      col(subject).isin(parts.toIndexedSeq: _*)
    else parts.map {
      case p if p.endsWith("*") => col(subject).startsWith(p.dropRight(1))
      case p => col(subject) === p
    }.reduce(_ || _)
  }

  /** `keys` command: list keys matching the reference's pattern rules
    * (`*`, `prefix*`, exact, comma lists — sis_utils.h:58-73). */
  def keys(df: DataFrame, subject: String, pattern: String): DataFrame =
    df.select(subject).filter(matchCond(subject, pattern))
      .distinct().orderBy(subject)
}
