package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: concatenate documents in a
  * deterministic total order and cut the token stream every `budget`
  * tokens — the concat-and-chunk sample packing GPT-style pipelines
  * run between curation and training (each training sequence is
  * exactly `budget` tokens; documents straddle cuts). The output is
  * the PLACEMENT map, one row per (document × overlapped sequence):
  * which training sequence each document span lands in, at which
  * offset — everything a downstream tokenizing writer needs to emit
  * fixed-length samples without ever materializing the concatenated
  * stream.
  *
  * Scale shape (the part that must survive 100 TB): the only global
  * state is a PREFIX SUM over the total order, computed like
  * [[Analytics.globalRowNumber]] — range-repartition on the order
  * key, one local running sum per partition, then per-partition
  * offsets (a #partitions-row table, broadcast). No stage ever sees
  * more than one partition's rows; the single-partition window runs
  * over the offsets table only (a dial, not the data). The chunk
  * explode emits ≤ tokens/budget + 1 rows per document — output is
  * O(corpus tokens / budget + docs), independent of partitioning.
  *
  * Determinism contract (what makes the DuckDB oracle exact): the
  * order must be total (pass a unique key such as doc_id — ENFORCED:
  * a duplicate order key raises in-plan rather than silently
  * overlapping placements), token
  * counts are exact integers, and every boundary is pure integer
  * arithmetic on the prefix sum — both engines reproduce identical
  * placements bit-for-bit. Zero-token documents occupy no span and
  * are dropped (they cannot land in any sequence).
  */
object SeqPack {

  /** Pack `df` into `budget`-token sequences along `order`. Output
    * columns: every input column plus
    *  - `seq`      — 0-based training-sequence id,
    *  - `off`      — the span's first token offset WITHIN the sequence,
    *  - `doc_off`  — the span's first token offset WITHIN the document,
    *  - `len`      — span token length (> 0).
    * Per document, spans partition [0, tokens); per sequence, spans
    * partition [0, budget) exactly (the final sequence may be short).
    * `tokens` must be a non-negative integral column. */
  def pack(df: DataFrame, tokens: String, budget: Long,
      order: Seq[Column]): DataFrame = {
    require(budget > 0, "sequence budget must be positive")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val docs = df.filter(col(tokens) > 0)
    val ranged = docs.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(order: _*)
    // inclusive local running sum over an explicit ROWS frame (the
    // default RANGE frame makes duplicate order keys frame PEERS —
    // they would share one sum and silently overlap their spans); the
    // doc's global start subtracts its own count back out
    // the guard key strips sort direction: `order` may legitimately
    // carry `.desc`/`.asc_nulls_last` wrappers (repartitionByRange and
    // Window.orderBy accept them), but SortOrder inside a projection
    // is an analysis error — struct() over the CHILD expressions keys
    // the duplicate check on the values themselves, which is exactly
    // the totality the contract requires
    val okey = struct(order.map(
      org.apache.spark.sql.graftbridge.ColumnBridge.stripSortOrder): _*)
    val local = ranged
      // enforce the totality contract in-plan instead of corrupting
      // placements: equal keys land in one range partition, so a
      // window lag sees every duplicate; the check rides the window
      // the sum already pays for — no extra shuffle
      // null-safe (`<=>`): with `===` a null order-key field makes the
      // comparison null, the raise never fires, and duplicate
      // null-keyed rows silently overlap — the corruption the guard
      // exists to prevent; lag's first-row null still compares false
      .withColumn("__dup", lag(okey, 1).over(localW) <=> okey)
      .withColumn("__lsum",
        sum(col(tokens).cast("long")).over(localW
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = local.groupBy("__pid")
      .agg(sum(col(tokens).cast("long")).as("__psum"))
      .withColumn("__off", coalesce(sum("__psum").over(
        Analytics.tinySeqW.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val placed = local.join(broadcast(offs), "__pid")
      .withColumn("__start",
        when(col("__dup"), raise_error(concat(
          lit("SeqPack.pack: duplicate order key "), to_json(okey),
          lit(" — the order must be total (pass a unique key such " +
            "as doc_id)"))))
          .otherwise(
            col("__off") + col("__lsum") - col(tokens).cast("long")))
      .withColumn("__end", col("__start") + col(tokens).cast("long"))
    val b = lit(budget)
    placed
      .withColumn("seq", explode(sequence(
        floor(col("__start") / b).cast("long"),
        floor((col("__end") - 1) / b).cast("long"))))
      .withColumn("__cut", greatest(col("__start"), col("seq") * b))
      .withColumn("off", (col("__cut") - col("seq") * b).cast("long"))
      .withColumn("doc_off", (col("__cut") - col("__start")).cast("long"))
      .withColumn("len",
        (least(col("__end"), (col("seq") + 1) * b) - col("__cut"))
          .cast("long"))
      .drop("__pid", "__dup", "__lsum", "__off", "__start", "__end",
        "__cut")
  }

  /** The packing's sequence-level contract, as a frame the caller can
    * REQUIRE over: (seq, docs, fill) — every sequence but the last
    * must fill to exactly the budget. */
  def fillStats(packed: DataFrame): DataFrame =
    packed.groupBy("seq")
      .agg(count(lit(1)).as("docs"), sum("len").as("fill"))
}
