package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is
  *    broadcast (queries ≪ corpus), so the "cross join" is really a
  *    map-side loop over each corpus partition — no shuffle of the
  *    corpus at all; only the per-query top-k rows shuffle for the
  *    final window. Correct baseline + the right plan when |Q| is small.
  *  - [[lshTopK]]: random-hyperplane LSH. Corpus and queries are
  *    bucketed by signature; candidates come from an equi-join on
  *    (band, bucket) and only candidates are re-ranked exactly. This is
  *    the 100 TB path: shuffle is proportional to candidates, not
  *    |Q|·|corpus|.
  */
object Similarity {

  /** Exact top-k cosine neighbors for every query vector.
    * Output: (query id, neighbor id, cosine, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("__qv")))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("__cv"))
    val scored = c.crossJoin(q)
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: signature bits → bands → candidate equi-join →
    * exact re-rank. Recall is tunable via (nPlanes, bands). */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int,
      nPlanes: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = 64 // embeddings are fixed-width; could be inferred per-dataset
    val planes = randomPlanes(nPlanes, dim, seed)
    val bits = nPlanes / bands
    def withBands(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val sig = hyperplaneSig(col(vec), planes)
      val bandCols = (0 until bands).map(b =>
        shiftright(col("__sig"), b * bits).bitwiseAND(lit((1L << bits) - 1)))
      df.select(col(id).as(idAs), col(vec).as(vecAs))
        .withColumn("__sig", sig)
        .select(col(idAs), col(vecAs), posexplode(array(bandCols: _*)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bucket")
    }
    val c = withBands(corpus, "neighbor_id", "__cv")
    val q = withBands(queries, "query_id", "__qv")
    val cands = q.join(c, Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "__qv", "__cv")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    * threshold). Exact variant: self-join blocked by LSH band so the
    * join is an equi-join; with `blocked = false` falls back to the
    * exact O(n²) pair scan (only sane for small n / verification). */
  def cosineDupPairs(
      df: DataFrame, id: String, vec: String,
      threshold: Double, blocked: Boolean = true,
      nPlanes: Int = 12, bands: Int = 6, seed: Long = 42L): DataFrame = {
    val base = df.select(col(id), col(vec))
    val pairs =
      if (!blocked) {
        val a = base.select(col(id).as("id_a"), col(vec).as("__va"))
        val b = base.select(col(id).as("id_b"), col(vec).as("__vb"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
      } else {
        val planes = randomPlanes(nPlanes, 64, seed)
        val bits = nPlanes / bands
        val sig = hyperplaneSig(col(vec), planes)
        val bandCols = (0 until bands).map(b =>
          shiftright(col("__sig"), b * bits).bitwiseAND(lit((1L << bits) - 1)))
        val banded = base.withColumn("__sig", sig)
          .select(col(id), col(vec), posexplode(array(bandCols: _*)))
          .toDF(id, vec, "band", "bucket")
        val a = banded.select(col(id).as("id_a"), col(vec).as("__va"),
          col("band"), col("bucket"))
        val b = banded.select(col(id).as("id_b"), col(vec).as("__vb"),
          col("band"), col("bucket"))
        a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
          .dropDuplicates("id_a", "id_b")
      }
    pairs
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
