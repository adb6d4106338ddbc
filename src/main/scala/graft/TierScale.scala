package graft

import graft.ops.BandIndex
import org.apache.spark.sql.functions._

/** Round-11 scaling harness (PLANS.md evidence): the tiered-compaction
  * write bound.
  *
  * Round 10's compact rewrote the ENTIRE base whenever the tail
  * crossed the file threshold, so a forever-running admission stream
  * paid O(index) writes every ~16 micro-batches — the round-10
  * verdict's one `weak`. The stepped-merge tiering
  * ([[graft.ops.BandIndex.compactTiered]]) bounds each merge by the
  * runs no larger than the incoming data, so per-row write
  * amplification is O(log(index / batch)) and the base run is
  * rewritten only when the accumulated newer data reaches its size.
  *
  * This harness appends N equal batches to an index seeded G batches
  * big, compacting after every batch (the st6 cadence, at its most
  * aggressive), and measures per-batch merged bytes against index
  * bytes. The claims it must show, per doubling of the index:
  *
  *  - MEAN merged bytes per batch grows ~log(index/batch), not
  *    linearly with the index (the round-10 slope was indexBytes/16);
  *  - the MAX single merge is bounded by the index's newer-run volume
  *    (occasional large merges are the amortization, not a stall
  *    per batch);
  *  - live run count stays ≤ ~log₂(batches);
  *  - the probe still equals a flat full scan, pair for pair.
  */
object TierScale {
  def main(args: Array[String]): Unit = {
    val batches = if (args.nonEmpty) args(0).toInt else 64
    val rowsPerBatch = if (args.length > 1) args(1).toInt else 5000
    // REAL-DATA mode (round-12, VERDICT r11 "what's wrong" #1): pass a
    // documents parquet dir as the 3rd arg and the batches are REAL
    // minhash band-bucket rows at the st6 dials (shingleK 3, sigLen
    // 32, 16 bands), split by doc_id — corroborating the synthetic
    // slope on production-shaped data (bucket hashes are uniform in
    // both, which is the claim being checked, not assumed).
    val docsDir = if (args.length > 2) Some(args(2)) else None
    val spark = Harness.session()
    import spark.implicits._

    val root = "/tmp/graft_tierscale/idx"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path("/tmp/graft_tierscale"), true)

    // deterministic synthetic bucket rows — compaction is
    // content-agnostic, so no need to re-run minhash here
    def syntheticRows(b: Int) =
      spark.range(b.toLong * rowsPerBatch, (b + 1).toLong * rowsPerBatch)
        .select(col("id").as("index_id"),
          pmod(col("id"), lit(16)).cast("int").as("band"),
          xxhash64(col("id"), lit("tier")).as("bucket"))
    val realBuckets = docsDir.map { dir =>
      val docs = spark.read.parquet(s"${dir.stripSuffix("/")}/documents.parquet")
        .select("doc_id", "text")
      graft.ops.Dedup.bandBuckets(
          graft.ops.Dedup.minhash(docs, "text", shingleK = 3, numHashes = 32),
          "doc_id", bands = 16, sigLen = 32, as = "index_id")
        .withColumn("__b", pmod(col("index_id"), lit(batches)).cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    def batchRows(b: Int) = realBuckets match {
      case Some(rb) => rb.filter(col("__b") === b).drop("__b")
      case None => syntheticRows(b)
    }

    BandIndex.write(batchRows(0), root, "bucket", targetRowsPerFile = 4096)
    var appended = 0L
    var rewritten = 0L
    var window = Vector.empty[BandIndex.CompactStats] // since last report
    (1 until batches).foreach { b =>
      val rows = batchRows(b)
      rows.write.mode("append").parquet(root)
      appended += 1
      val st = BandIndex.compactTiered(spark, root, "bucket",
        targetRowsPerFile = 4096, minTailFiles = 1).get
      rewritten += st.mergedBytes
      window :+= st
      if ((b & (b + 1)) == 0 || b == batches - 1) { // b = 1,3,7,15,31,63
        val meanMerged = window.map(_.mergedBytes).sum / window.size
        val maxMerged = window.map(_.mergedBytes).max
        println(f"batches=${b + 1}%3d indexBytes=${st.indexBytes}%10d " +
          f"meanMergedBytes=$meanMerged%9d maxMergedBytes=$maxMerged%9d " +
          f"runs=${st.runsAfter}%2d " +
          f"amplification=${rewritten.toDouble / math.max(1L, st.indexBytes)}%.2f")
        window = Vector.empty
      }
    }
    // correctness tie-off, falsifiable: point-probe REAL bucket values
    // drawn from the index itself and require the pruned read returns
    // exactly the rows a full scan holds for those keys — a pruning
    // bug (wrong manifest splice, lost run, stale range) changes a
    // nonzero count, unlike a probe of disjoint synthetic keys
    val keys = spark.read.parquet(root).select("bucket")
      .orderBy(rand(7)).limit(64).collect().map(_.getLong(0))
    val (prunedDf, pstats) = BandIndex.readForKeys(spark, root, keys, "bucket")
    val pruned = prunedDf.filter(col("bucket").isInCollection(keys)).count()
    val full = spark.read.parquet(root)
      .filter(col("bucket").isInCollection(keys)).count()
    require(pruned == full && pruned >= 64,
      s"tiered pruned read diverged: $pruned vs $full rows for 64 keys")
    require(pstats.selectedBase < pstats.baseFiles,
      s"point probe selected every file: $pstats")
    // amplification = total bytes rewritten by all compactions over
    // the index's final size ≈ how many times the average row was
    // rewritten; the O(log₂(batches)) bound here is ~6 at 64 batches,
    // vs batches/16 ≈ 4 → ~32 (and growing linearly) for the
    // round-10 full-rewrite every-16-batches policy at this cadence
    // (every batch, so round-10 amortized = batches/2)
    val entries = BandIndex.readEntries(spark, root, "bucket")
    val finalBytes = f.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    println(f"final: files=${entries.size} " +
      f"runs=${entries.map(_.run).distinct.size} " +
      f"totalRewritten=$rewritten " +
      f"amplification=${rewritten.toDouble / math.max(1L, finalBytes)}%.2f")
    spark.stop()
  }
}
