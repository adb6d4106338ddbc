package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pruned-probe storage for the PERSISTED dedup index — the fix for
  * the one plan in this repo whose slope was wrong at scale: the
  * stored-index probe streamed the ENTIRE index through its join on
  * every batch ([[Dedup.probeBandedIndex]] over a flat parquet dir),
  * and the verdict lookup streamed the entire signature table, so each
  * micro-batch of a 10⁹-doc admission stream paid two full-index scans
  * even though it touches only its own buckets and its own candidates.
  *
  * Bucket values are uniform 64-bit hashes, so parquet min/max
  * skipping over arbitrarily-written files prunes NOTHING (every file
  * spans most of the hash range). The layout earns the pruning:
  *
  *  - '''Base''': [[write]] range-partitions the rows by a long `key`
  *    column (`bucket` for the banded index, `doc_id` for signatures)
  *    and sorts within partitions, so each file covers one narrow,
  *    non-overlapping key range, and records a per-file (min, max)
  *    MANIFEST (`_manifest.json` — the underscore keeps parquet
  *    readers from touching it).
  *  - '''Tail''': rows appended after the base (streaming admissions)
  *    are ordinary appended files, absent from the manifest. A probe
  *    always reads the whole tail; [[compact]] folds the tail back
  *    into a sorted base and rewrites the manifest — the standard LSM
  *    shape, built from parquet parts and two renames.
  *  - '''Probe''': [[readForKeys]] takes the probe's key set (bounded
  *    driver-side: the batch's `bands × |batch|` bucket hashes, or the
  *    candidate ids of one batch — the same "batch fits on one
  *    executor" contract the probe's broadcast already pins; unbounded
  *    batches keep the unpruned full-scan path), selects the base
  *    files whose range intersects it, and reads ONLY
  *    `selected base ∪ tail`. File selection is a conservative
  *    superset — join results are identical to the full scan, which
  *    the d12/d11/st6 oracles check pair-for-pair.
  *
  * Per-batch probe cost is thus `O(min(|base files|, |keys|) + |tail|)`
  * files instead of `O(index)` rows: a point lookup of one key opens
  * exactly one base file (ranges are disjoint, up to an equal boundary
  * key), and a small batch against a 10⁹-doc index opens the handful
  * of files its keys land in. Measured in [[graft.IncScale]]:
  * full-scan probe wall grows with index size G, pruned probe stays
  * flat with selected-file count capped by the batch's key count.
  */
object BandIndex {
  /** `_`-prefixed so parquet dir readers skip it. */
  private[graft] val ManifestFile = "_manifest.json"

  private def fs(ss: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(ss.sparkContext.hadoopConfiguration)

  private def dataFiles(ss: SparkSession, root: String) =
    fs(ss).listStatus(new org.apache.hadoop.fs.Path(root))
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }

  /** Write `df` as a pruned-probe base: range partitioned + sorted by
    * the long `key` column, sized to `targetRowsPerFile`, with the
    * per-file (min, max) manifest. Mode is overwrite — this IS the
    * base; later appends form the tail. */
  def write(df: DataFrame, root: String, key: String = "bucket",
      targetRowsPerFile: Long = 1L << 22,
      knownCount: Option[Long] = None): Unit = {
    val ss = df.sparkSession
    // the frame is consumed twice (count to size the range partitions,
    // then the write) — persist it, or an expensive input (a corpus
    // minhash pass) recomputes in full for the count. Callers that
    // already know the row count pass it (seedIndex: sigs = corpus
    // rows, buckets = exactly bands × corpus rows) and skip the cache
    // entirely; an input the CALLER persisted is never re-cached here —
    // persist returns the same object, so the finally-unpersist would
    // silently evict the caller's own cache.
    val cacheHere = knownCount.isEmpty &&
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val mat = if (cacheHere)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    try {
      val n = knownCount.getOrElse(mat.count())
      val parts = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
        .min(100000L).toInt
      mat.repartitionByRange(parts, col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite").parquet(root)
    } finally if (cacheHere) mat.unpersist()
    writeManifest(ss, root, key)
  }

  /** (Re)derive and commit the manifest from the CURRENT data files —
    * one metadata+key-column scan. Commit is tmp+rename; a reader that
    * finds no (or a torn) manifest treats every file as tail — slower,
    * never wrong. */
  private[graft] def writeManifest(ss: SparkSession, root: String,
      key: String): Unit = {
    val ranges = ss.read.parquet(root)
      .groupBy(col("_metadata.file_name").as("file"))
      .agg(min(key).as("mn"), max(key).as("mx"))
      .collect()
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("key", key)
    val arr = node.putArray("files")
    ranges.foreach { r =>
      val e = arr.addObject()
      e.put("file", r.getString(0))
      e.put("min", r.getLong(1))
      e.put("max", r.getLong(2))
    }
    val f = fs(ss)
    val tmp = new org.apache.hadoop.fs.Path(root, ManifestFile + ".tmp")
    val out = f.create(tmp, true)
    try out.write(m.writeValueAsBytes(node)) finally out.close()
    val dest = new org.apache.hadoop.fs.Path(root, ManifestFile)
    f.delete(dest, false)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"could not commit $dest")
  }

  /** file name → (min key, max key); empty if absent/unreadable or
    * keyed on a different column (all files then count as tail —
    * correct, just unpruned). */
  private def readManifest(ss: SparkSession, root: String, key: String)
      : Map[String, (Long, Long)] = {
    val f = fs(ss)
    val p = new org.apache.hadoop.fs.Path(root, ManifestFile)
    if (!f.exists(p)) return Map.empty
    try {
      val in = f.open(p)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
          buf.toByteArray
        } finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
      if (node.path("key").asText() != key) return Map.empty
      val files = node.path("files")
      (0 until files.size()).map { i =>
        val e = files.get(i)
        e.path("file").asText() ->
          (e.path("min").asLong(), e.path("max").asLong())
      }.toMap
    } catch { case _: java.io.IOException => Map.empty }
  }

  /** What one pruned read touched — the evidence behind the pruning
    * claims (d12 `require`s a point lookup opens ≤ 2 base files). */
  final case class ProbeStats(totalFiles: Int, baseFiles: Int,
      selectedBase: Int, tailFiles: Int) {
    def readFiles: Int = selectedBase + tailFiles
  }

  /** True iff some element of `sorted` lies in [mn, mx]. */
  private def hits(sorted: Array[Long], mn: Long, mx: Long): Boolean = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) { // first element >= mn
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < mn) lo = mid + 1 else hi = mid
    }
    lo < sorted.length && sorted(lo) <= mx
  }

  /** Pruned read: the rows of `root` whose `key` column MAY take one
    * of `keys` values — a conservative file-level superset (selected
    * base files + the whole tail); the caller's equi-join/semi-join
    * does the exact filtering. `keys` need not be sorted. */
  def readForKeys(ss: SparkSession, root: String, keys: Array[Long],
      key: String = "bucket"): (DataFrame, ProbeStats) = {
    if (!fs(ss).exists(new org.apache.hadoop.fs.Path(root)))
      recover(ss, root) // a compact may have died mid-swap
    val sorted = keys.sorted
    val manifest = readManifest(ss, root, key)
    val all = dataFiles(ss, root)
    val (base, tail) = all.partition(s => manifest.contains(s.getPath.getName))
    val selected = base.filter { s =>
      val (mn, mx) = manifest(s.getPath.getName)
      hits(sorted, mn, mx)
    }
    val stats = ProbeStats(all.length, base.length, selected.length,
      tail.length)
    val paths = (selected ++ tail).map(_.getPath.toString)
    val df =
      if (paths.isEmpty) {
        // schema still needed for the caller's join: read zero rows of
        // one footer if any file exists, else fail loudly (an index
        // with no data files is a caller bug, not an empty probe)
        require(all.nonEmpty || manifest.isEmpty,
          s"$root: manifest names files that do not exist")
        if (all.isEmpty)
          throw new java.io.FileNotFoundException(s"$root has no data files")
        ss.read.parquet(all.head.getPath.toString).limit(0)
      } else ss.read.parquet(paths.toIndexedSeq: _*)
    (df, stats)
  }

  /** Probe the stored banded index at `root` with a batch's minhash
    * signatures: candidate pairs identical to
    * [[Dedup.probeBandedIndex]] over the same rows, but the scan reads
    * only the base files whose bucket range intersects the batch plus
    * the unmanifested tail. */
  def probe(root: String, newSigs: DataFrame, id: String,
      bands: Int, sigLen: Int, indexIdCol: String = "index_id")
      : (DataFrame, ProbeStats) = {
    val ss = newSigs.sparkSession
    val newSide = Dedup.bandBuckets(newSigs, id, bands, sigLen, as = "new_id")
    // bounded by the broadcast contract: bands × |batch| longs
    val batchBuckets = newSide.select("bucket").distinct()
      .collect().map(_.getLong(0))
    val (index, stats) = readForKeys(ss, root, batchBuckets, "bucket")
    val pairs = broadcast(newSide)
      .join(index.select(col(indexIdCol).as("index_id"), col("band"),
          col("bucket")),
        Seq("band", "bucket"))
      .select("new_id", "index_id").distinct()
    (pairs, stats)
  }

  /** Large-batch probe: the same candidate pairs as [[probe]], with
    * NOTHING riding the driver — the batch's buckets stay distributed
    * and the join shuffles both sides on (band, bucket). The pruned
    * probe wins in the trickle/micro-batch regime, where the batch's
    * key set selects few base files; once a batch is large enough that
    * its keys blanket the key space (a backfill screening millions of
    * docs), every base file is read either way and the driver-side
    * bucket collect + broadcast become pure liabilities — this is that
    * path. Size estimates downstream of [[Dedup.bandBuckets]]'s
    * posexplode are fiction, so the join pins `merge`; AQE may still
    * DOWNGRADE to broadcast from measured sizes, the safe direction. */
  def probeLarge(root: String, newSigs: DataFrame, id: String,
      bands: Int, sigLen: Int, indexIdCol: String = "index_id")
      : DataFrame = {
    val ss = newSigs.sparkSession
    if (!fs(ss).exists(new org.apache.hadoop.fs.Path(root)))
      recover(ss, root)
    val newSide = Dedup.bandBuckets(newSigs, id, bands, sigLen, as = "new_id")
    val index = ss.read.parquet(root)
      .select(col(indexIdCol).as("index_id"), col("band"), col("bucket"))
    newSide.hint("merge")
      .join(index, Seq("band", "bucket"))
      .select("new_id", "index_id").distinct()
  }

  /** Dial between [[probe]] and [[probeLarge]] on the batch's key
    * volume: `bands × |batch|` bucket keys at or under `maxProbeKeys`
    * keeps the pruned, driver-bounded path (stats returned as
    * evidence); above it the probe shuffles and no row ever visits
    * the driver. The one extra action is a count of the batch —
    * cheap by the same "the batch is the small side" premise that
    * makes the pruned path safe, and the price of never letting an
    * unexpectedly large batch OOM the driver instead of degrading to
    * a shuffle. */
  def probeAuto(root: String, newSigs: DataFrame, id: String,
      bands: Int, sigLen: Int, indexIdCol: String = "index_id",
      maxProbeKeys: Long = 1L << 22)
      : (DataFrame, Option[ProbeStats]) = {
    val batchRows = newSigs.count()
    if (batchRows * bands <= maxProbeKeys) {
      val (pairs, stats) = probe(root, newSigs, id, bands, sigLen, indexIdCol)
      (pairs, Some(stats))
    } else
      (probeLarge(root, newSigs, id, bands, sigLen, indexIdCol), None)
  }

  /** Fold the appended tail back into a sorted, manifested base —
    * the LSM merge. Parquet files can't be mutated in place, so the
    * rewrite goes through a rename-aside tmp with the same marker
    * protocol as [[graft.store.TsStore]] pack: write the merged base
    * to `<root>__compacting` (job `_SUCCESS` = complete), then swap.
    * A crash anywhere is healed by [[recover]] (the live dir vanishes
    * for the duration of two renames — covered by the engine-wide
    * single-writer contract). No-op when the tail is under
    * `minTailFiles`. Returns true if it compacted. */
  def compact(ss: SparkSession, root: String, key: String = "bucket",
      targetRowsPerFile: Long = 1L << 22, minTailFiles: Int = 8): Boolean = {
    recover(ss, root)
    val manifest = readManifest(ss, root, key)
    val all = dataFiles(ss, root)
    val tail = all.count(s => !manifest.contains(s.getPath.getName))
    if (tail < minTailFiles) return false
    val f = fs(ss)
    val tmp = root.stripSuffix("/") + "__compacting"
    f.delete(new org.apache.hadoop.fs.Path(tmp), true)
    val rows = ss.read.parquet(root)
    val n = rows.count()
    val parts = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
      .min(100000L).toInt
    rows.repartitionByRange(parts, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(tmp)
    val live = new org.apache.hadoop.fs.Path(root)
    val old = new org.apache.hadoop.fs.Path(root.stripSuffix("/") + "__old")
    f.delete(old, true)
    if (!f.rename(live, old))
      throw new java.io.IOException(s"compact: could not set aside $root")
    if (!f.rename(new org.apache.hadoop.fs.Path(tmp), live)) {
      f.rename(old, live) // roll back; tmp still complete on disk
      throw new java.io.IOException(s"compact: could not commit $root")
    }
    f.delete(old, true)
    writeManifest(ss, root, key)
    true
  }

  /** Heal a [[compact]] that died mid-swap. The manifest travels
    * inside the dir, so every outcome is safe: a rolled-back `__old`
    * still holds its matching manifest; a rolled-forward
    * `__compacting` holds none (all files tail until the next
    * compact's [[writeManifest]]) — unpruned, never wrong. */
  def recover(ss: SparkSession, root: String): Unit = {
    val f = fs(ss)
    val live = new org.apache.hadoop.fs.Path(root)
    val tmp = new org.apache.hadoop.fs.Path(
      root.stripSuffix("/") + "__compacting")
    val old = new org.apache.hadoop.fs.Path(root.stripSuffix("/") + "__old")
    if (!f.exists(live)) {
      if (f.exists(tmp) &&
        f.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) {
        if (!f.rename(tmp, live))
          throw new java.io.IOException(s"compact recovery: $root")
      } else if (f.exists(old)) {
        if (!f.rename(old, live))
          throw new java.io.IOException(s"compact recovery: $root")
      }
    }
    if (f.exists(live)) { // either way, leftovers are trash now
      f.delete(tmp, true)
      f.delete(old, true)
    }
  }
}
