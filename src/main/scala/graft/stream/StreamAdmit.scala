package graft.stream

import graft.ops.Dedup
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
  *  - Each micro-batch probes the STORED bucket table
  *    ([[Dedup.probeBandedIndex]] — the batch side broadcasts, the
  *    index streams map-side), est-Jaccard-verdicts the candidates
  *    from the stored signatures, admits the clean documents, and
  *    APPENDS their fingerprints+signatures to the index — batch N+1
  *    is screened against everything admitted through batch N with
  *    no corpus re-scan and no index re-banding.
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
  /** Persist the curated corpus's probe state under `indexRoot`:
    * `buckets/` = (index_id, band, bucket), `sigs/` = (doc_id,
    * minhash). */
  def seedIndex(corpusSigs: DataFrame, id: String, indexRoot: String,
      bands: Int, sigLen: Int): Unit = {
    corpusSigs.select(col(id).as("doc_id"), col("minhash"))
      .write.mode("overwrite").parquet(s"$indexRoot/sigs")
    Dedup.bandBuckets(corpusSigs, id, bands, sigLen, as = "index_id")
      .write.mode("overwrite").parquet(s"$indexRoot/buckets")
  }

  /** Screen one batch against the stored index and append the
    * admissions — the foreachBatch body, public so a batch pipeline
    * (or a spec) can drive it without a stream. Returns the admitted
    * (doc_id, batch) rows it wrote. */
  def admitBatch(batch: DataFrame, id: String, text: String,
      indexRoot: String, admittedRoot: String, batchId: Long,
      bands: Int, sigLen: Int, shingleK: Int,
      minEstJaccard: Double): Unit = {
    val ss = batch.sparkSession
    val newSigs = Dedup.minhash(batch.select(col(id).as("doc_id"),
      col(text).as("__text")), "__text", shingleK, sigLen)
      .select("doc_id", "minhash")
    val dupIds = Dedup.minhashJaccard(
        Dedup.probeBandedIndex(ss.read.parquet(s"$indexRoot/buckets"),
            newSigs, "doc_id", bands, sigLen)
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
          .select(col("new_id").as("id_a"), col("index_id").as("id_b")),
        newSigs.unionByName(ss.read.parquet(s"$indexRoot/sigs")), "doc_id")
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
  }

  /** Wire a file-source document stream through [[admitBatch]]. */
  def start(spark: SparkSession, feedDir: String, schema:
      org.apache.spark.sql.types.StructType, id: String, text: String,
      indexRoot: String, admittedRoot: String, checkpoint: String,
      bands: Int = 16, sigLen: Int = 32, shingleK: Int = 3,
      minEstJaccard: Double = 0.5,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        admitBatch(b.toDF(), id, text, indexRoot, admittedRoot, batchId,
          bands, sigLen, shingleK, minEstJaccard)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
