package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED mergeable sketch state — the production shape of the
  * hh1/qs1/hll1 reconnaissance queries (the same argument as the
  * stored dedup/ANN indexes d12/x5): a 100 TB corpus cannot re-stream
  * through a sketch build per question, so the INGEST side computes
  * one bounded sketch-state row per (group, shard) once, persists the
  * narrow state table, and every later question costs a read+merge of
  * state whose size is set by the sketch dials, not the corpus.
  * Sharding mirrors ingest batches: any partitioning works because
  * every structure here is an exact algebraic merge —
  *
  *  - '''Count-Min''': depth×width count matrices; merging partials
  *    elementwise-sums them, which is BIT-EXACT equal to the
  *    single-pass sketch of the union (counts are sums), so the
  *    classic `truth ≤ estimate ≤ truth + ε·N` bound survives any
  *    shard split. State per shard: `depth × width` longs.
  *  - '''HLL''' (DataSketches, Spark's `hll_sketch_agg` /
  *    `hll_union_agg`): registers merge by per-slot max — order- and
  *    split-independent — so a union of shard partials meets the SAME
  *    rsd bound as a one-pass sketch (estimates can differ sub-rsd
  *    when the LIST→SET→HLL mode promotion lands at different points
  *    on the two paths; the shard split costs no accuracy, which is
  *    the contract). State per (group, shard): ≤ `2^lgK` registers.
  *  - '''Quantile grids''' (mergeable rank summaries): per
  *    (group, shard), the shard's EXACT order statistics at the k
  *    bucket boundaries (value + rank, so each grid point carries its
  *    bucket's row weight). A shard's CDF is reproduced within
  *    `⌈n_i/k⌉` ranks everywhere, so the merged weighted grid answers
  *    any quantile within `Σ⌈n_i/k⌉ ≤ N/k + #shards` ranks — the
  *    mergeable-summary bound [Greenwald-Khanna-style ε = 1/k], which
  *    callers REQUIRE against exact truth. Build cost is a
  *    within-shard sort (bounded by the shard, the unit that already
  *    fits an executor); the merge never sorts more than
  *    `#shards × k` grid points per group.
  *
  * Persisted with [[save]] under a caller-supplied stamp (the
  * engine's `sourceStamp` pattern: regenerated data re-keys the path,
  * so stale sketches can never serve silently). */
object Sketches {

  // ── Count-Min ───────────────────────────────────────────────────

  /** One serialized CMS per shard over `value`'s items. */
  def cmsPartials(df: DataFrame, value: String, shard: Column,
      eps: Double, confidence: Double, seed: Int): DataFrame =
    df.groupBy(shard.as("__shard"))
      .agg(expr(s"count_min_sketch(`$value`, ${eps}d, ${confidence}d, $seed)")
        .as("cms"))

  /** Merge stored CMS partials into one sketch. Driver-side by
    * design: the state is `#shards` blobs of `depth × width` longs —
    * the whole point is that this is tiny relative to the corpus. */
  def mergeCms(ss: SparkSession, path: String)
      : org.apache.spark.util.sketch.CountMinSketch = {
    val blobs = ss.read.parquet(path).select("cms").collect()
      .map(_.getAs[Array[Byte]](0))
    require(blobs.nonEmpty, s"$path holds no CMS partials")
    val first = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(blobs.head))
    blobs.tail.foldLeft(first) { (acc, b) =>
      acc.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)))
    }
  }

  // ── HLL distinct sketches ──────────────────────────────────────

  /** One HLL register set per (group, shard) over `value`. */
  def hllPartials(df: DataFrame, value: String, groups: Seq[String],
      shard: Column, lgK: Int = 12): DataFrame =
    df.groupBy(groups.map(col) :+ shard.as("__shard"): _*)
      .agg(expr(s"hll_sketch_agg(`$value`, $lgK)").as("hll"))

  /** Union stored HLL partials per group → distinct estimates —
    * all-SQL, nothing rides the driver. */
  def hllEstimates(partials: DataFrame, groups: Seq[String],
      as: String = "approx_distinct"): DataFrame =
    partials.groupBy(groups.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(hll))").as(as))

  // ── Mergeable quantile grids ───────────────────────────────────

  /** Per (group, shard): the shard's exact order statistics at the
    * `k` bucket boundaries, each carrying its bucket's row count —
    * `grid: array<struct<v: double, w: long>>` ascending, plus the
    * shard row count `n`. The within-shard sort is the build cost;
    * state is ≤ k rows per shard regardless of shard size. */
  def quantilePartials(df: DataFrame, value: String, groups: Seq[String],
      shard: Column, k: Int = 128): DataFrame = {
    // NULLs are excluded — row_number orders nulls first, so a null
    // value could otherwise become a grid point (v = null) and poison
    // low-q estimates through quantileEstimates' min(when(...)). The
    // grid's `n` therefore counts NON-NULL rows only: quantiles are
    // statements about values, and every caller's rank checks compare
    // against non-null truth.
    val sh = df.filter(col(value).isNotNull)
      .withColumn("__shard", shard)
      .withColumn("__v", col(value).cast("double"))
    val part = (groups :+ "__shard").map(col)
    val byV = Window.partitionBy(part: _*).orderBy(col("__v"))
    val all = Window.partitionBy(part: _*)
    // __rn as LONG before the ·k products: row_number is 32-bit and a
    // shard above ~2^31/k rows would overflow the boundary arithmetic
    val graded = sh
      .withColumn("__rn", row_number().over(byV).cast("long"))
      .withColumn("__n", count(lit(1)).over(all))
    // keep the LAST rank of each of the k equal-depth buckets: rows
    // where ⌊rn·k/n⌋ crosses a boundary — ≤ k rows, always includes
    // the shard max (rn = n)
    val sel = graded.filter(
      floor(col("__rn") * k / col("__n")) >
        floor((col("__rn") - 1) * k / col("__n")))
    val byRank = Window.partitionBy(part: _*).orderBy(col("__rn"))
    sel
      .withColumn("__w",
        col("__rn") - coalesce(lag(col("__rn"), 1).over(byRank), lit(0L)))
      .groupBy(part: _*)
      .agg(sort_array(collect_list(struct(col("__v").as("v"),
        col("__w").as("w")))).as("grid"), max("__n").as("n"))
  }

  /** Merged quantile estimates from stored grids: explode the grid
    * points (≤ `#shards × k` per group — the merge never touches
    * data), accumulate weights in value order, and read each `q` off
    * the merged CDF. Rank guarantee: the exact rank of the returned
    * value is within `N/k + #shards` of `q·N`. */
  def quantileEstimates(partials: DataFrame, groups: Seq[String],
      qs: Seq[(Double, String)]): DataFrame = {
    val pts = partials
      .select(groups.map(col) :+ explode(col("grid")).as("g"): _*)
      .select(groups.map(col) :+ col("g.v").as("v") :+ col("g.w").as("w"): _*)
    val byV = Window.partitionBy(groups.map(col): _*)
      .orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = pts
      .withColumn("__cum", sum("w").over(byV))
      .withColumn("__tot",
        sum("w").over(Window.partitionBy(groups.map(col): _*)))
    val aggs = qs.map { case (q, name) =>
      min(when(col("__cum") >= ceil(lit(q) * col("__tot")), col("v")))
        .as(name)
    }
    cum.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ── persistence ────────────────────────────────────────────────

  /** Write a partial-state table under `root/<kind>_<stamp>` —
    * overwrite (state derives deterministically from its source; the
    * stamp key makes staleness impossible, not the write mode). */
  def save(partials: DataFrame, root: String, kind: String,
      stamp: String): String = {
    val path = s"${root.stripSuffix("/")}/${kind}_$stamp"
    partials.write.mode("overwrite").parquet(path)
    path
  }

  /** STREAMING maintenance: land one micro-batch's partial-state rows
    * under `root/<kind>_<stamp>/batch=<id>` — the foreachBatch sink
    * shape. REPLAY-IDEMPOTENT by construction: the batch id keys the
    * subdirectory and the write OVERWRITES it, so a crashed batch
    * re-delivered by the checkpoint replays into the SAME slot
    * instead of appending a duplicate partial (the st6 write-order
    * pattern; an `append`-mode write here would double-count every
    * replayed row). Readers read the whole `root/<kind>_<stamp>` tree
    * — every merge in this family is shard-algebraic, so per-batch
    * partials merge exactly like any other sharding. */
  def appendBatch(partials: DataFrame, root: String, kind: String,
      stamp: String, batchId: Long): String = {
    val path = s"${root.stripSuffix("/")}/${kind}_$stamp/batch=$batchId"
    partials.write.mode("overwrite").parquet(path)
    path
  }

  /** The merged read side of [[appendBatch]]: every batch's partials
    * as one frame (recursive so `batch=N` subdirs flatten; the state
    * is dial-bounded per batch, not corpus-bounded). */
  def readBatches(ss: SparkSession, root: String, kind: String,
      stamp: String): DataFrame =
    ss.read.option("recursiveFileLookup", "true")
      .parquet(s"${root.stripSuffix("/")}/${kind}_$stamp")

  /** True iff a state table for (kind, stamp) is already present. */
  def exists(ss: SparkSession, root: String, kind: String,
      stamp: String): Boolean =
    org.apache.hadoop.fs.FileSystem.get(ss.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(
        s"${root.stripSuffix("/")}/${kind}_${stamp}/_SUCCESS"))
}
