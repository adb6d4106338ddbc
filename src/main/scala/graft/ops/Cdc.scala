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
    * diffing positionally-matched columns.
    *
    * PRECONDITION: `keys` must be unique on EACH side — a duplicate
    * fans out m×n in the full-outer join and emits spurious update
    * rows, silently breaking the "apply feed to old state reproduces
    * new state" contract. The engine surface guarantees this
    * ((subject, time) is the store's primary key); for the public op
    * `assertUniqueKeys` (default on) raises in-plan on the first
    * violation, TOTALLY: each side pre-aggregates by key with a
    * multiplicity count, so every duplicate is caught — including one
    * whose payloads are identical (the feed cannot represent row
    * multiplicity, so even an "all-unchanged" duplicate silently
    * breaks apply-feed reproducibility and must raise). Cost: the
    * per-side hash aggregation is map-side combinable and keyed
    * exactly like the join, so its exchange replaces (not adds to)
    * the key shuffle the full-outer join pays anyway. Pass `false`
    * when uniqueness is already guaranteed upstream to skip the
    * aggregation entirely. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      assertUniqueKeys: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val payload = newDf.columns.filterNot(keys.contains).toSeq
    require(oldDf.columns.filterNot(keys.contains).toSeq == payload,
      s"diff requires identical payload columns, got " +
        s"${oldDf.columns.toSeq} vs ${newDf.columns.toSeq} — align " +
        "schemas first (Convert.align) for a cross-era diff")
    require(payload.nonEmpty, "diff needs at least one payload column")
    // one side: (keys..., payload struct), optionally wrapped in the
    // duplicate-multiplicity guard. `first` under __kcnt == 1 is THE
    // row's payload (deterministic); under a violation the raise fires
    // before the arbitrary pick could ever be observed.
    def side(df: DataFrame, pname: String, label: String): DataFrame = {
      val base = df.select(keys.map(col) :+
        struct(payload.map(col): _*).as(pname): _*)
      if (!assertUniqueKeys) base
      else base
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__kcnt"), first(col(pname)).as(pname))
        .withColumn(pname,
          when(col("__kcnt") > 1, raise_error(concat(
            lit("Cdc.diff: duplicate key "),
            to_json(struct(keys.map(col): _*)),
            lit(s" on the $label side — keys must be unique on each " +
              "side (a duplicate fans out in the full-outer join and " +
              "corrupts the feed)"))).cast(base.schema(pname).dataType))
            .otherwise(col(pname)))
        .drop("__kcnt")
    }
    val o = side(oldDf, "old", "old").alias("__o")
    val n = side(newDf, "new", "new").alias("__n")
    // NULL-SAFE key equality (still a hash-joinable equi-key): a
    // plain equi-join never matches null keys, so a null-keyed update
    // would surface as a spurious delete+insert pair — here it
    // matches and classifies like any other key (the guard's groupBy
    // likewise pools null keys, matching <=> semantics)
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
