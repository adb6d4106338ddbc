package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over a stored postings index — the
  * scored sibling of ix1's boolean search. The index layout
  * denormalizes the document length into every posting row (the
  * classic search-engine trade: one extra long per posting buys
  * probe-time independence from any document-side table), so a probe
  * touches exactly the queried terms' postings plus a one-row stats
  * sidecar.
  *
  * Scale shape: index build is two hash aggregations (term-doc tf,
  * doc length) and one doc-keyed equi-join — all map-side combinable;
  * the probe is a pruned scan (`In` pushdown) + a broadcast of the
  * per-term df (≤ #query terms rows) + a one-row stats broadcast +
  * one groupBy(doc) over matching postings only. Nothing at probe
  * time is proportional to corpus size.
  */
object Search {

  /** Postings with denormalized doc length: (term, id, tf, dl). */
  def postings(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), explode(filter(split(col(text), "\\s+"),
      w => length(w) > 0)).as("term"))
    val dl = toks.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    toks.groupBy(col("term"), col(id)).agg(count(lit(1)).as("tf"))
      .join(dl, Seq(id))
      .select(col("term"), col(id), col("tf"), col("dl"))
  }

  /** One-row corpus stats (n docs, mean doc length) from postings'
    * distinct (id, dl) pairs. */
  def corpusStats(post: DataFrame, id: String): DataFrame =
    post.select(col(id), col("dl")).distinct()
      .agg(count(lit(1)).cast("double").as("n"),
        avg(col("dl").cast("double")).as("avgdl"))

  /** Okapi BM25 per-(doc, term) score as integer MICROS:
    * floor(s·1e6 + 0.5) of
    *   idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    *   idf = ln((n − df + 0.5)/(df + 0.5) + 1).
    * Integer micros make the downstream per-doc SUM exact, so ranking
    * survives any addition order. Constants are pre-folded literals
    * (k1=1.2, b=0.75 → 2.2, 0.25, 0.75) so every engine that mirrors
    * this expression tree runs the same IEEE ops in the same order. */
  def bm25Micro(tf: Column, df: Column, dl: Column,
      n: Column, avgdl: Column): Column = {
    val idf = log((n - df + 0.5) / (df + 0.5) + 1.0)
    val s = idf * (tf.cast("double") * 2.2) /
      (tf.cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (dl.cast("double") / avgdl)))
    floor(s * 1e6 + 0.5).cast("long")
  }

  /** Top-k BM25 rank from (already pruned) postings: per-term df from
    * the pruned postings themselves, stats from the one-row sidecar.
    * Output: (id, n_terms, score_1e6) ordered by score desc, id. */
  def bm25Rank(post: DataFrame, id: String, stats: DataFrame,
      k: Int): DataFrame = {
    val dfT = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    post.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__micro", bm25Micro(col("tf"), col("df"), col("dl"),
        col("n"), col("avgdl")))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"), sum(col("__micro")).as("score_1e6"))
      .orderBy(col("score_1e6").desc, col(id)).limit(k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher's RRF) of
    * independently ranked retrieval lists — the standard way a RAG
    * stack combines lexical (BM25) and vector (ANN) retrieval without
    * calibrating their incommensurable scores: each list contributes
    * 1/(k0 + rank) per document and the contributions sum. Every list
    * df must carry (`id`, `rank`) with rank 1-based.
    *
    * Determinism contract: the textbook 1/(k0+rank) is summed here as
    * EXACT integer quotients — floor(10^12/(k0+rank)) per entry, then
    * a BIGINT sum — so neither float division nor addition order can
    * wobble the fused ranking between engines (the ix2 score-micros
    * discipline applied to fusion). At 10^12 the floor loses relative
    * precision ~10^-10 per term: fusion ties it could create simply
    * do not occur at real list depths, and the id tiebreak would
    * break them identically in both engines anyway.
    *
    * Scale shape: the inputs are top-K lists — K·#lists rows per
    * query, a dial — so the union + one map-side-combinable groupBy
    * is O(K) per query regardless of corpus size; fusion never
    * re-touches the indexes that produced the lists. Output per id:
    * `n_lists` (how many retrievers returned it), one nullable
    * `rank_<name>` per input list, and the fused `rrf_1e12`. */
  def rrfFuse(lists: Seq[(String, DataFrame)], id: String,
      k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(lists.map(_._1).distinct.size == lists.size,
      "rrfFuse list names must be unique")
    val contrib = lists.map { case (name, df) =>
      df.select(col(id), lit(name).as("__sys"),
        col("rank").cast("int").as("__r"))
    }.reduce(_.unionByName(_))
      .withColumn("__c",
        expr(s"CAST(1000000000000 AS BIGINT) div ($k0 + __r)"))
    val aggs = Seq(count(lit(1)).as("n_lists")) ++
      lists.map { case (name, _) =>
        max(when(col("__sys") === name, col("__r"))).as(s"rank_$name")
      } :+ sum(col("__c")).as("rrf_1e12")
    contrib.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }
}
