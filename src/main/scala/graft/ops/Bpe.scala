package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the iterative loop tok1 takes one step of:
  * count adjacent symbol pairs corpus-wide, merge the argmax pair
  * everywhere, repeat. The per-round shape is scale-honest:
  *
  *  - pair counting is one explode to (a, b) + a combinable groupBy —
  *    the shuffle carries partial counts of short strings, never
  *    documents;
  *  - the argmax is ONE driver-side row per round (count desc, then
  *    (a, b) asc — a total order, so cross-engine deterministic); the
  *    merge table is the training OUTPUT and is bounded by the round
  *    dial, which is exactly how production BPE trainers use their
  *    reducers;
  *  - applying a merge is a per-row greedy left-to-right fold
  *    (`aggregate` over the symbol array) — embarrassingly parallel,
  *    no shuffle. Within one round a merge can never cascade: the
  *    merged symbol is strictly longer than either side, so it can't
  *    re-match the pair — which also makes greedy one-pass equal to
  *    repeat-leftmost (the property the relational oracle leans on).
  *  - each round `localCheckpoint`s the symbol frame: bounded rounds,
  *    truncated lineage (the CC/d9 lesson — never let an iterative
  *    plan nest).
  *
  * At 100 TB: rounds × (one corpus scan + one slim pair-count
  * shuffle). Real trainers fold the corpus to a word-frequency table
  * first and train on that; the loop here is already weight-carrying
  * ([[pairCounts]] sums a `__wt` column that [[train]] seeds at 1 per
  * occurrence), so the frequency-table variant is the same code path
  * with `__wt` = word count — no change to the rounds.
  */
object Bpe {

  final case class Merge(round: Int, left: String, right: String, n: Long)

  /** Greedy left-to-right application of one merge (a, b) → ab over a
    * symbol array: standard BPE semantics ("a a a a" with (a,a) pairs
    * 1-2 and 3-4, not the middle). */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent-pair occurrence counts, weighted (weight 1 = raw words;
    * pre-aggregated word frequencies plug in the same way). */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("__wt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("__wt")).as("n"))

  /** The ENCODE path: apply an ordered merge table to every document
    * — tokenizer inference. The merge folds run once per DISTINCT
    * word, not per occurrence (the Zipf dividend: vocabulary ≪ corpus
    * words — folding occurrences directly cost 2.6× the whole encode
    * when measured at sf0.1), then encoded lengths re-attach by word
    * and aggregate per document. Shuffle ledger: one distinct over
    * bare words, one word-keyed join (AQE broadcasts real
    * vocabularies), one doc-keyed count aggregate — every shuffled row
    * is a word or a pair of longs, never a document. Output: (id,
    * `n_sym0` — symbols before any merge = characters in words,
    * `n_sym` — symbols after all merges, the token count a budget
    * planner prices); wordless documents emit no row. */
  def encode(df: DataFrame, id: String, text: String,
      merges: Seq[Merge]): DataFrame = {
    val occ = df.select(col(id), explode(filter(split(col(text), "\\s+"),
      w => length(w) > 0)).as("__w"))
    val vocab = occ.select(col("__w")).distinct()
      .withColumn("__syms", merges.foldLeft(
        transform(sequence(lit(1), length(col("__w"))),
          i => col("__w").substr(i, lit(1))): Column) { (syms, m) =>
        applyMerge(syms, m.left, m.right)
      })
      .select(col("__w"), length(col("__w")).cast("long").as("__s0"),
        size(col("__syms")).cast("long").as("__s"))
    occ.join(vocab, "__w")
      .groupBy(col(id))
      .agg(sum("__s0").as("n_sym0"), sum("__s").as("n_sym"))
  }

  /** `rounds` BPE merges over the whitespace words of `text`. Returns
    * the merge table and the post-merge symbol frame (for vocab /
    * continuation). */
  def train(docs: DataFrame, text: String, rounds: Int): (Seq[Merge], DataFrame) = {
    var words = docs.select(explode(filter(split(col(text), "\\s+"),
        w => length(w) > 0)).as("w"))
      .select(lit(1L).as("__wt"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"))
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is one symbol
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, n)
        words = words.select(col("__wt"),
          applyMerge(col("syms"), a, b).as("syms")).localCheckpoint()
      }
      r += 1
    }
    (merges.result(), words)
  }
}
