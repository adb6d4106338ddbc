package graft.ops

import graft.functions.Fnv1a64Expr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: deterministic splits/sampling,
  * corpus shuffling, and sequence packing/chunking for context windows.
  *
  * Everything here is reproducible-by-construction: selection and
  * ordering decisions are pure functions of a record's id through
  * FNV-1a (never an RNG), so a 100 TB run re-executed after a failure —
  * or audited months later in another engine — selects byte-identical
  * rows. That mirrors how the reference keys every behavior off the
  * record's own key/time rather than ambient state (sis_db.h key
  * model), and it is what makes these stages oracle-checkable at all.
  *
  * Scale shape per operator:
  *  - split/sample: stateless per-row hash math at scan speed — no
  *    shuffle, no RNG state, fully pushdown-friendly.
  *  - shuffle/pack: one range shuffle on the hash/order key plus a
  *    #partitions-row broadcast of per-partition offsets
  *    ([[Analytics.globalRowNumber]]'s two-pass trick) — no stage ever
  *    materializes a global window.
  *  - chunking: per-row explode, executor-side only.
  */
object Pipeline {

  /** Hash a record id into [0, mod) deterministically. The id is
    * hashed as its decimal-string form so any engine (and the DuckDB
    * oracle) reproduces the bucket without sharing a binary layout. */
  def hashBucket(id: Column, salt: String, mod: Int): Column =
    pmod(Fnv1a64Expr(concat(lit(salt + ":"), id.cast("string"))), lit(mod.toLong))

  /** Deterministic train/val/test split: bucket the id-hash into
    * percentage bands. `splits` are (name, weight) pairs whose weights
    * sum to `mod` (default percent). A row's assignment never changes
    * as the corpus grows — adding documents never reshuffles existing
    * ones across splits, which is what keeps eval sets stable across
    * pipeline runs (an RNG-based split has neither property). */
  def hashSplit(df: DataFrame, id: Column, splits: Seq[(String, Int)],
      salt: String = "split", out: String = "split",
      bucketOut: String = "bucket"): DataFrame = {
    requireFresh(df, Seq(bucketOut, out))
    val mod = splits.map(_._2).sum
    val bucket = hashBucket(id, salt, mod)
    val assigned = splits.dropRight(1)
      .foldLeft((when(lit(false), lit("")), 0)) { case ((expr, cum), (name, w)) =>
        (expr.when(bucket < cum + w, name), cum + w)
      }._1.otherwise(splits.last._1)
    df.withColumn(bucketOut, bucket).withColumn(out, assigned)
  }

  /** Output/internal columns must not shadow same-named input columns —
    * a silent collision would corrupt the join/filter semantics (an
    * input `__stratum` would make stratifiedSample's broadcast-join
    * condition ambiguous). Fail loudly instead. */
  private def requireFresh(df: DataFrame, names: Seq[String]): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename them " +
        "or pass different output column names")
  }

  /** Stratified sampling with per-stratum keep-rates (mixture
    * weighting for pretraining: up/down-sample sources or languages).
    * `rates` maps stratum → keep fraction; strata absent from the map
    * keep `default`. Selection is the id-hash against the stratum's
    * threshold — deterministic, per-row, no shuffle: the rates table
    * broadcasts and the filter runs at scan speed. */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      rates: Map[String, Double], default: Double,
      salt: String = "sample", mod: Int = 10000): DataFrame = {
    requireFresh(df, Seq("__bucket", "__stratum", "__thresh", "__rate"))
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = rates.toSeq.toDF("__stratum", "__rate")
      .withColumn("__thresh", round($"__rate" * mod).cast("long"))
      .select("__stratum", "__thresh")
    val defaultThresh = math.round(default * mod)
    df.withColumn("__bucket", hashBucket(id, salt, mod))
      .join(broadcast(thresholds), stratum === col("__stratum"), "left")
      .filter(col("__bucket") < coalesce(col("__thresh"), lit(defaultThresh)))
      .drop("__stratum", "__thresh")
  }

  /** Balance groups to the smallest group's size — the
    * mixture-flattening stage of a pretraining pipeline (cap every
    * source/language at the same share) with keep-rates DERIVED from
    * the data rather than passed in ([[stratifiedSample]] is the
    * explicit-rates variant). The keep rule is pure integer math:
    * keep iff `bucket(id) * |group| < min|group| * mod` — exactly a
    * `min|g| / |g|` keep rate with no double rounding ambiguity
    * cross-engine (`bucket < mod` and group counts ≤ ~9e12 keep the
    * product inside a long). The per-group counts are one tiny
    * aggregate broadcast back; the filter itself runs at scan speed,
    * so the only data-sized cost is the counting pass. */
  def balanceGroups(df: DataFrame, group: Column, id: Column,
      salt: String = "balance", mod: Int = 1000000): DataFrame = {
    requireFresh(df, Seq("__bucket", "__grp", "__cnt", "__min"))
    val counts = df.groupBy(group.as("__grp")).agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min("__cnt").as("__min"))
    df.withColumn("__bucket", hashBucket(id, salt, mod))
      .join(broadcast(counts), group === col("__grp"))
      .crossJoin(broadcast(minCnt)) // bounded: exactly one row
      .filter(col("__bucket") * col("__cnt") < col("__min") * lit(mod.toLong))
      .drop("__bucket", "__grp", "__cnt", "__min")
  }

  /** Temperature-flattened sampling (α = 0.5, the sqrt-temperature
    * multilingual-pretraining standard): keep rate
    * `min(1, sqrt(min|g| / |g|))` — between [[balanceGroups]]'s full
    * flattening (`min/|g|`) and keeping everything; big groups are
    * down-sampled toward, not onto, the smallest group's share. The
    * rate math is deliberately a SINGLE division + sqrt of exact
    * integer counts (no cross-group floating sum whose order could
    * differ between engines), so the oracle reproduces thresholds
    * bit-identically; thresholds floor to integers before the bucket
    * compare. Same scan-speed filter shape as balanceGroups. */
  def temperatureSample(df: DataFrame, group: Column, id: Column,
      salt: String = "temper", mod: Int = 1000000): DataFrame = {
    requireFresh(df, Seq("__bucket", "__grp", "__cnt", "__min", "__thr"))
    val counts = df.groupBy(group.as("__grp")).agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min("__cnt").as("__min"))
    val thresholds = counts.crossJoin(broadcast(minCnt)) // bounded: one row
      .withColumn("__thr", floor(sqrt(col("__min").cast("double") /
        col("__cnt").cast("double")) * lit(mod.toLong)).cast("long"))
      .select("__grp", "__thr")
    df.withColumn("__bucket", hashBucket(id, salt, mod))
      .join(broadcast(thresholds), group === col("__grp"))
      .filter(col("__bucket") < col("__thr"))
      .drop("__bucket", "__grp", "__thr")
  }

  /** Deterministic global shuffle: order the corpus by the id-hash
    * (plus id as collision tiebreak) and materialize each row's 1-based
    * position. This is the "shuffle the training data" stage — the
    * order is a pure function of (salt, id), so epoch N's order is
    * reproducible and changing the salt gives an independent order.
    * Position comes from [[Analytics.globalRowNumber]]: range-partition
    * on the hash, rank locally, add broadcast offsets — total order
    * with no single-partition stage. */
  def globalShuffle(df: DataFrame, id: Column, salt: String,
      out: String = "pos"): DataFrame = {
    requireFresh(df, Seq("__shuf", out))
    val keyed = df.withColumn("__shuf",
      Fnv1a64Expr(concat(lit(salt + ":"), id.cast("string"))))
    Analytics.globalRowNumber(keyed, Seq(col("__shuf"), id), out)
  }

  /** Concat-and-chunk sequence packing: lay the corpus out as one
    * virtual token stream in `order`-key order, then cut it into fixed
    * `ctx`-token context windows. Emits one row per (document, window)
    * overlap — a document straddling a boundary contributes a row per
    * window it touches. This is the packing shape LLM pretraining
    * uses (concatenate documents, split at ctx boundaries): zero
    * padding waste, and — unlike greedy bin-packing — expressible as
    * pure window math over a global exclusive running sum of token
    * counts, which the two-pass offset trick computes scalably.
    *
    * Output columns: the order key, `n_tok`, `tok_offset` (exclusive
    * global cumsum), `chunk_id`, `n_in_chunk` (tokens this document
    * contributes to this window).
    *
    * `order +: tiebreak` together must be a total order: equal keys
    * could tie within the range partition and the local window would
    * order them nondeterministically, making tok_offset assignment
    * run-dependent — the same reason [[globalShuffle]] tiebreaks on
    * (hash, id). Pass the record id as `tiebreak` whenever `order`
    * alone may repeat; with a unique `order` the default is fine. */
  def packChunks(df: DataFrame, order: Column, nTok: Column,
      ctx: Int, tiebreak: Seq[Column] = Nil): DataFrame = {
    requireFresh(df, Seq("n_tok", "tok_offset", "chunk_id", "n_in_chunk",
      "__pid", "__lcum", "__ptok", "__off"))
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val orderKeys = order +: tiebreak
    val withTok = df.withColumn("n_tok", nTok.cast("long"))
    val ranged = withTok.repartitionByRange(parts, orderKeys: _*)
      .withColumn("__pid", spark_partition_id())
    // pass 1: per-partition exclusive running sums; pass 2: broadcast
    // per-partition totals → global exclusive offset (same shape as
    // globalRowNumber, summing tokens instead of counting rows)
    val localW = Window.partitionBy("__pid").orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__lcum",
      coalesce(sum(col("n_tok")).over(localW), lit(0L)))
    val totals = local.groupBy("__pid").agg(sum("n_tok").as("__ptok"))
    val offs = totals.withColumn("__off", coalesce(
        sum("__ptok").over(Analytics.tinySeqW.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val placed = local.join(broadcast(offs), "__pid")
      .withColumn("tok_offset", col("__off") + col("__lcum"))
      .drop("__pid", "__lcum", "__off")
      .filter(col("n_tok") > 0)
    // chunk indices via integral long division (`div`), never double
    // `/`: a double round-trip is exact only to 2^53 cumulative tokens,
    // and the whole point of the two-pass offset is arbitrary corpus
    // size. Offsets are non-negative so truncating div == floor.
    val first = expr(s"tok_offset div ${ctx}L")
    val last = expr(s"(tok_offset + n_tok - 1) div ${ctx}L")
    placed
      .withColumn("chunk_id", explode(sequence(first, last)))
      .withColumn("n_in_chunk",
        least(col("tok_offset") + col("n_tok"), (col("chunk_id") + 1) * lit(ctx.toLong))
          - greatest(col("tok_offset"), col("chunk_id") * lit(ctx.toLong)))
  }

  /** Sliding-window document chunking: fixed `size`-char windows every
    * `stride` chars (overlap = size − stride keeps boundary context in
    * two chunks). Start positions are 0, stride, 2·stride, …; the last
    * window starts at the first position whose window reaches the end
    * of the text, so no content is dropped and no start runs past the
    * end. Pure per-row explode — no shuffle, executor-side only. */
  def chunkSliding(df: DataFrame, text: Column, size: Int,
      stride: Int): DataFrame = {
    require(stride > 0 && size >= stride,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val n = length(text)
    // number of extra windows beyond the first: ceil((n-size)/stride)
    val lastIdx = when(n <= size, 0L)
      .otherwise(((n - size + stride - 1) / stride).cast("long"))
    df.withColumn("chunk_idx", explode(sequence(lit(0L), lastIdx)))
      .withColumn("chunk_text",
        substring(text, (col("chunk_idx") * stride + 1).cast("int"), lit(size)))
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
