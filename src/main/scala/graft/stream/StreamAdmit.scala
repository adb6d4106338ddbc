package graft.stream

import graft.ops.{BandIndex, Dedup}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-dup ADMISSION against a stored fingerprint index —
  * the d11/d12 incremental-dedup contract as a continuous ingest
  * stage (the shape a training-data pipeline runs forever: a curated
  * corpus accumulates, every incoming batch is screened against it).
  *
  *  - The curated corpus's banded fingerprints AND minhash signatures
  *    are persisted once ([[seedIndex]]) — narrow tables, tiny
  *    relative to the corpus text.
  *  - Each micro-batch probes the STORED bucket table through the
  *    pruned-read layout ([[BandIndex.probe]] — the batch side
  *    broadcasts; the scan opens ONLY the base files whose bucket
  *    range the batch touches, plus the appended tail), est-Jaccard-
  *    verdicts the candidates from a likewise-pruned signature
  *    lookup, admits the clean documents, and APPENDS their
  *    fingerprints+signatures to the index — batch N+1 is screened
  *    against everything admitted through batch N with no corpus
  *    re-scan, no index re-banding, and per-batch cost bounded by
  *    the batch (not the index). [[BandIndex.compact]] periodically
  *    folds the appended tail back into the sorted base.
  *
  * Admission semantics, pinned: a batch is screened against
  * index ∪ prior admissions ONLY. Intra-batch near-dups are NOT
  * checked — that is the upstream batch-dedup stage's job (d1/d2/d4
  * over the batch) and keeping it out of the admission step makes
  * the admitted set independent of intra-batch ordering. A document
  * near-dup of a REJECTED document (but of nothing in the curated
  * set) is admitted: the index is the corpus being curated, not the
  * reject log — screening is against what the corpus CONTAINS.
  * Precondition (as for d11's split): batch ids are disjoint from
  * index ids — a re-ingested id would join the wrong signature in
  * the verdict lookup. Upstream exact-id dedup (st4) owns this.
  *
  * Durability: the three sinks inside foreachBatch are not atomic
  * with the checkpoint commit, so the write ORDER is load-bearing
  * for replay idempotence: sigs → buckets → admitted. ALL of the
  * batch's own ids are excluded from the index side of its candidate
  * pairs (an anti-join, not just self-pair removal), so a replayed
  * batch is never screened against its own partial appends — without
  * that, an intra-batch near-dup pair would admit both docs on a
  * clean run but reject one on replay; a crash after the sigs append
  * replays into
  * duplicate identical sig rows (fan equal-valued verdict rows,
  * distinct()-ed away), a crash after the buckets append replays
  * into duplicate bucket rows (duplicate candidate pairs,
  * distinct()-ed away), and `admitted` — the output consumers read —
  * is written exactly once, last. The REVERSE order would be a real
  * bug: buckets-before-sigs leaves a crash window where a doc's
  * buckets exist without its signature, and every later near-dup of
  * it would silently pass screening. */
object StreamAdmit {
  /** Persist the curated corpus's probe state under `indexRoot` in
    * the pruned-probe layout ([[BandIndex]]): `buckets/` = (index_id,
    * band, bucket) range-sorted by `bucket`, `sigs/` = (doc_id,
    * minhash) range-sorted by `doc_id`, each with its per-file
    * (min, max) manifest so batches read only the files they can
    * match. Doc ids must be integral (they key the manifest). */
  def seedIndex(corpusSigs: DataFrame, id: String, indexRoot: String,
      bands: Int, sigLen: Int,
      targetRowsPerFile: Long = 1L << 22): Unit = {
    BandIndex.write(corpusSigs.select(col(id).as("doc_id"), col("minhash")),
      s"$indexRoot/sigs", "doc_id", targetRowsPerFile)
    BandIndex.write(
      Dedup.bandBuckets(corpusSigs, id, bands, sigLen, as = "index_id"),
      s"$indexRoot/buckets", "bucket", targetRowsPerFile)
  }

  /** Screen one batch against the stored index and append the
    * admissions — the foreachBatch body, public so a batch pipeline
    * (or a spec) can drive it without a stream. Returns the admitted
    * (doc_id, batch) rows it wrote. */
  def admitBatch(batch: DataFrame, id: String, text: String,
      indexRoot: String, admittedRoot: String, batchId: Long,
      bands: Int, sigLen: Int, shingleK: Int,
      minEstJaccard: Double, compactMinTailFiles: Int = 16): Unit = {
    val ss = batch.sparkSession
    val newSigs = Dedup.minhash(batch.select(col(id).as("doc_id"),
      col(text).as("__text")), "__text", shingleK, sigLen)
      .select("doc_id", "minhash")
    val pairs = BandIndex.probe(s"$indexRoot/buckets", newSigs,
        "doc_id", bands, sigLen)._1
      // a replayed batch finds its own prior appends in the index —
      // and not only as exact self-pairs: a crash after the buckets
      // append leaves the WHOLE batch's rows in the index, so a doc
      // that is an intra-batch near-dup of another batch doc would
      // be screened against its own partial append and rejected on
      // replay while a clean run admits it. Anti-join the index
      // side against the full batch id set: batch ids are disjoint
      // from legitimate index ids by precondition (see scaladoc),
      // so this only removes rows from a prior partial append of
      // this same batch — keeping the pinned "screened against
      // index ∪ prior admissions ONLY" contract deterministic
      // across replays.
      .join(broadcast(newSigs.select(col("doc_id").as("index_id"))),
        Seq("index_id"), "left_anti")
      .select(col("new_id").as("id_a"), col("index_id").as("id_b"))
      // materialized once: the candidate ids are collected to prune
      // the signature lookup, then the pairs join the verdict — the
      // candidate set is LSH-bounded (≈ flat per doc), the same
      // driver-size contract as the probe's bucket collect
      .localCheckpoint()
    val candIds = pairs.select("id_b").distinct().collect()
      .map(_.get(0).asInstanceOf[Number].longValue())
    // verdict signatures: the batch's own + ONLY the stored sigs the
    // candidates can touch (pruned file-level read — without this the
    // verdict join re-scans the whole signature table every batch,
    // the same wrong slope the bucket probe had)
    val idxSigs = BandIndex.readForKeys(ss, s"$indexRoot/sigs", candIds,
      "doc_id")._1.select("doc_id", "minhash")
    val dupIds = Dedup.minhashJaccard(pairs,
        newSigs.unionByName(idxSigs), "doc_id")
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a").as("doc_id")).distinct()
    val admitted = newSigs.join(dupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint() // one materialization; three sinks below reuse it
    // sigs FIRST, buckets second, the consumer-facing admitted log
    // LAST — the crash-window analysis in the scaladoc depends on it
    admitted.write.mode("append").parquet(s"$indexRoot/sigs")
    Dedup.bandBuckets(admitted, "doc_id", bands, sigLen, as = "index_id")
      .write.mode("append").parquet(s"$indexRoot/buckets")
    admitted.select(col("doc_id"), lit(batchId).as("batch"))
      .write.mode("append").parquet(admittedRoot)
    // LSM maintenance, AFTER the consumer-facing write so admission
    // latency is unaffected: each append above adds one unmanifested
    // file set per micro-batch, and a stream running forever would
    // otherwise accumulate thousands of small tail files until
    // listing + footer reads dominate the probe. compact() folds the
    // tail into the sorted base once it crosses the threshold and
    // no-ops (one listing) below it. Content-preserving, so replay
    // idempotence and the crash-window analysis above are untouched;
    // a crash mid-compact is healed by BandIndex.recover on the next
    // probe.
    BandIndex.compact(ss, s"$indexRoot/sigs", "doc_id",
      minTailFiles = compactMinTailFiles)
    BandIndex.compact(ss, s"$indexRoot/buckets", "bucket",
      minTailFiles = compactMinTailFiles)
  }

  /** Wire a file-source document stream through [[admitBatch]]. */
  def start(spark: SparkSession, feedDir: String, schema:
      org.apache.spark.sql.types.StructType, id: String, text: String,
      indexRoot: String, admittedRoot: String, checkpoint: String,
      bands: Int = 16, sigLen: Int = 32, shingleK: Int = 3,
      minEstJaccard: Double = 0.5,
      maxFilesPerTrigger: Int = 1,
      compactMinTailFiles: Int = 16): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        admitBatch(b.toDF(), id, text, indexRoot, admittedRoot, batchId,
          bands, sigLen, shingleK, minEstJaccard, compactMinTailFiles)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
