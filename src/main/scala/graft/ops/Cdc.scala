package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed row-level diff between two committed states — the change
  * feed a downstream incremental consumer wants instead of re-reading
  * the world: which keys appeared, vanished, or changed payload
  * between state A and state B. The engine surface
  * ([[graft.api.Engine.changesBetween]]) applies it to two pinned
  * snapshot generations, turning the store's time-travel history into
  * CDC (the reference keeps per-generation block history for exactly
  * this "what moved" question — sis_disk history records; here the
  * answer is a DataFrame, not a replay).
  *
  * Scale shape: one full-outer equi-join on the key columns — both
  * sides shuffle on the same key, nothing else moves, and unchanged
  * rows (the overwhelming majority between adjacent generations)
  * are dropped before anything downstream runs. Payloads compare as
  * ONE struct with null-safe equality (`<=>`), so a field going
  * null⇄value is an update, never a silent "unchanged".
  */
object Cdc {

  /** Diff `newDf` against `oldDf` by `keys`: one row per key whose
    * payload (every non-key column, as a struct) differs —
    * `op ∈ {insert, delete, update}` with the `old`/`new` payload
    * structs carried (null on the absent side). Unchanged keys are
    * dropped. Both sides must share one schema: a cross-era diff
    * aligns first ([[Convert.align]]) — refusing here beats silently
    * diffing positionally-matched columns. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String])
      : DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val payload = newDf.columns.filterNot(keys.contains).toSeq
    require(oldDf.columns.filterNot(keys.contains).toSeq == payload,
      s"diff requires identical payload columns, got " +
        s"${oldDf.columns.toSeq} vs ${newDf.columns.toSeq} — align " +
        "schemas first (Convert.align) for a cross-era diff")
    require(payload.nonEmpty, "diff needs at least one payload column")
    val o = oldDf.select(keys.map(col) :+
      struct(payload.map(col): _*).as("old"): _*).alias("__o")
    val n = newDf.select(keys.map(col) :+
      struct(payload.map(col): _*).as("new"): _*).alias("__n")
    // NULL-SAFE key equality (still a hash-joinable equi-key): a
    // plain equi-join never matches null keys, so a null-keyed update
    // would surface as a spurious delete+insert pair — here it
    // matches and classifies like any other key
    val on = keys.map(k => col(s"__o.$k") <=> col(s"__n.$k"))
      .reduce(_ && _)
    o.join(n, on, "full_outer")
      .withColumn("op",
        when(col("new").isNull, lit("delete"))
          .when(col("old").isNull, lit("insert"))
          .when(!(col("old") <=> col("new")), lit("update")))
      .filter(col("op").isNotNull)
      .select(keys.map(k =>
        coalesce(col(s"__o.$k"), col(s"__n.$k")).as(k)) ++
        Seq(col("op"), col("old"), col("new")): _*)
  }
}
