package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — market data is pathologically skewed
  * (one index subject can carry 1000× the ticks of the median), and at
  * 100 TB a single hot key pins one reducer. Two standard levers,
  * packaged:
  *
  *  - [[saltedAgg]]: two-stage aggregation — partial aggregate on
  *    (key, salt), then final on key. Works for any algebraic agg.
  *  - [[saltedJoin]]: fact side salted N ways, dimension side
  *    replicated N ways → the hot key's rows spread over N reducers.
  *    Result identical to the plain equi-join.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) already
  * covers sort-merge joins at runtime; these are for the shapes AQE
  * can't rewrite (aggregations, broadcast-ineligible dims).
  */
object Skew {

  /** Two-stage (salted) aggregation: `partial` computes per
    * (keys, salt) slices, `merge` combines slices per key. Caller
    * supplies both halves, e.g. partial = sum → merge = sum,
    * partial = count → merge = sum. */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salt: Int,
      partial: Seq[(String, Column)],
      merge: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Exact top-N rows per key under skew: two-stage rank instead of
    * one window per key. Stage 1 ranks within (key, salt) — the hot
    * key's rows spread over `salt` reducers — and keeps each slice's
    * local top-N (any row outside its slice's top-N cannot be in the
    * key's global top-N: the slice alone already holds N better
    * rows). Stage 2 ranks the survivors per key exactly; its input is
    * ≤ salt·N rows per key — a dial, not the data — so the hottest
    * key on a 100 TB corpus costs one reducer at most salt·N rows.
    * `order` must give a TOTAL order (append a unique tiebreaker such
    * as the row id) — same contract, and same reason, as
    * [[SeqPack.pack]]: both engines must agree on which row is rank
    * N+1. Output: the kept rows with their exact per-key `rank`. */
  def saltedTopN(df: DataFrame, keys: Seq[String], order: Seq[Column],
      n: Int, salt: Int = 16): DataFrame = {
    require(n > 0 && salt > 0, "saltedTopN: n and salt must be positive")
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val local = Window
      .partitionBy((keys.map(col) :+ col("__salt")): _*).orderBy(order: _*)
    val survivors = salted
      .withColumn("__lrank", row_number().over(local))
      .filter(col("__lrank") <= n)
      .drop("__salt", "__lrank")
    val exact = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    survivors.withColumn("rank", row_number().over(exact))
      .filter(col("rank") <= n)
  }

  /** Salted equi-join: every fact row gets a random salt in [0, n);
    * every dim row is replicated n times (one per salt value); the join
    * key becomes (keys..., salt). Same rows out as the unsalted join,
    * but a hot key spreads across n reducers. Use when the dim is too
    * big to broadcast and AQE's skew split doesn't apply. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      n: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(n)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    saltedFact.join(replicatedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
