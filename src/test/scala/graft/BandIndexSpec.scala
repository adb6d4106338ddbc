package graft

import graft.ops.{BandIndex, Dedup}
import graft.stream.StreamAdmit
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The pruned-probe index layout: candidates identical to the full
  * scan, point lookups open O(1) base files, appended tails are
  * always read, compaction bounds the file count without changing
  * any admission, and a compact that crashes mid-swap is healed. */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private def hfs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  // 40 corpus docs + 6 incoming, 3 of them near-dups of corpus docs
  private val corpus = (1 to 40).map { i =>
    (i.toLong, (1 to 40).map(j => s"c${i}_$j").mkString(" "))
  }.toDF("doc_id", "text")
  private val incoming = ((1 to 3).map { i =>
    (100L + i, (1 to 40).map(j => s"c${i}_$j").mkString(" ")
      .replaceFirst("_7 ", "_7x "))
  } ++ (4 to 6).map { i =>
    (100L + i, (1 to 40).map(j => s"n${i}_$j").mkString(" "))
  }).toDF("doc_id", "text")

  private def sigs(df: org.apache.spark.sql.DataFrame) =
    Dedup.minhash(df, "text", shingleK = 3, numHashes = 32)
      .select("doc_id", "minhash")

  test("pruned probe == full-scan probe, pair for pair") {
    val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
    val corpusSigs = sigs(corpus)
    val buckets = Dedup.bandBuckets(corpusSigs, "doc_id", 16, 32,
      as = "index_id")
    BandIndex.write(buckets, root, "bucket", targetRowsPerFile = 64)
    val inc = sigs(incoming)
    val (pruned, stats) = BandIndex.probe(root, inc, "doc_id", 16, 32)
    val full = Dedup.probeBandedIndex(spark.read.parquet(root), inc,
      "doc_id", 16, 32)
    val a = pruned.orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = full.orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b && a.nonEmpty, s"pruned=$a full=$b")
    assert(stats.baseFiles == stats.totalFiles && stats.tailFiles == 0)
  }

  test("probeLarge == pruned probe pair for pair; probeAuto dials on batch size") {
    val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
    val corpusSigs = sigs(corpus)
    BandIndex.write(Dedup.bandBuckets(corpusSigs, "doc_id", 16, 32,
      as = "index_id"), root, "bucket", targetRowsPerFile = 64)
    val inc = sigs(incoming)
    val pruned = BandIndex.probe(root, inc, "doc_id", 16, 32)._1
      .orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val large = BandIndex.probeLarge(root, inc, "doc_id", 16, 32)
      .orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(large == pruned && large.nonEmpty, s"large=$large pruned=$pruned")
    // small batch under the key cap → pruned path, stats as evidence
    val (smallPairs, smallStats) =
      BandIndex.probeAuto(root, inc, "doc_id", 16, 32)
    assert(smallStats.nonEmpty, "small batch should take the pruned path")
    assert(smallPairs.orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == pruned)
    // a key cap below bands × |batch| forces the shuffle path (no
    // stats: nothing visited the driver), same pairs
    val (bigPairs, bigStats) =
      BandIndex.probeAuto(root, inc, "doc_id", 16, 32, maxProbeKeys = 16)
    assert(bigStats.isEmpty, "over-cap batch should take the shuffle path")
    assert(bigPairs.orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == pruned)
  }

  test("point lookup opens at most 2 base files; missing keys open 0") {
    val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
    val buckets = Dedup.bandBuckets(sigs(corpus), "doc_id", 16, 32,
      as = "index_id")
    BandIndex.write(buckets, root, "bucket", targetRowsPerFile = 64)
    val some = spark.read.parquet(root).select("bucket")
      .limit(5).collect().map(_.getLong(0))
    some.foreach { k =>
      val (df, st) = BandIndex.readForKeys(spark, root, Array(k), "bucket")
      assert(st.selectedBase <= 2 && st.selectedBase >= 1,
        s"point lookup of $k: $st")
      assert(st.baseFiles > 2, "too few files for the test to mean anything")
      assert(df.filter(col("bucket") === k).count() >= 1)
    }
    // a key between files' ranges (or outside them) selects nothing
    val (_, none) = BandIndex.readForKeys(spark, root,
      Array(Long.MaxValue), "bucket")
    assert(none.selectedBase <= 1)
  }

  test("appended tail is always read; compact folds it into the base") {
    val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
    val corpusSigs = sigs(corpus)
    BandIndex.write(Dedup.bandBuckets(corpusSigs, "doc_id", 16, 32,
      as = "index_id"), root, "bucket", targetRowsPerFile = 64)
    // append an out-of-band near-dup of incoming doc 101 (id 900)
    val nd = Seq((900L, (1 to 40).map(j => s"c1_$j").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.bandBuckets(sigs(nd), "doc_id", 16, 32, as = "index_id")
      .write.mode("append").parquet(root)
    val inc = sigs(incoming)
    val (pairs, st) = BandIndex.probe(root, inc, "doc_id", 16, 32)
    assert(st.tailFiles > 0, "append produced no tail files")
    assert(pairs.filter(col("index_id") === 900L).count() > 0,
      "tail rows missed by the pruned probe")
    val before = pairs.orderBy("new_id", "index_id").collect().toSeq
    assert(BandIndex.compact(spark, root, "bucket",
      targetRowsPerFile = 64, minTailFiles = 1))
    val (after, st2) = BandIndex.probe(root, inc, "doc_id", 16, 32)
    assert(st2.tailFiles == 0 && st2.baseFiles == st2.totalFiles)
    assert(after.orderBy("new_id", "index_id").collect().toSeq == before,
      "compaction changed probe results")
    assert(!BandIndex.compact(spark, root, "bucket", minTailFiles = 1),
      "compact of a tail-free index should no-op")
  }

  test("tiered compaction: steady small batches never rewrite the large base") {
    val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
    // a base ~20x any batch: 125 docs x 16 bands = 2000 bucket rows
    val big = (1 to 125).map { i =>
      (i.toLong, (1 to 40).map(j => s"b${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    BandIndex.write(Dedup.bandBuckets(sigs(big), "doc_id", 16, 32,
      as = "index_id"), root, "bucket", targetRowsPerFile = 64)
    val baseFiles = hfs.listStatus(hp(root))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSet
    assert(baseFiles.size >= 10, s"base too small to prove anything")
    var maxRuns = 0
    (0 until 8).foreach { b =>
      val batch = Seq((5000L + b, (1 to 40).map(j => s"t${b}_$j")
        .mkString(" "))).toDF("doc_id", "text")
      Dedup.bandBuckets(sigs(batch), "doc_id", 16, 32, as = "index_id")
        .write.mode("append").parquet(root)
      val st = BandIndex.compactTiered(spark, root, "bucket",
        targetRowsPerFile = 64, minTailFiles = 1)
      assert(st.nonEmpty, s"batch $b: compact no-opped with a tail present")
      // the merge is bounded by the newer runs, far under the index
      assert(st.get.mergedBytes < st.get.indexBytes / 2,
        s"batch $b merged most of the index: ${st.get}")
      maxRuns = math.max(maxRuns, st.get.runsAfter)
    }
    // the base run was never rewritten: its files are all still live
    val after = hfs.listStatus(hp(root))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSet
    assert(baseFiles.subsetOf(after),
      "steady small batches rewrote the base run")
    // stepped-merge keeps the live run count logarithmic in batches
    assert(maxRuns <= 5, s"run count not tiered: $maxRuns")
    // and the tiered index still probes identically to a flat scan
    val inc = sigs(incoming)
    val (pruned, stats) = BandIndex.probe(root, inc, "doc_id", 16, 32)
    assert(stats.tailFiles == 0, s"compact left a tail: $stats")
    val full = Dedup.probeBandedIndex(spark.read.parquet(root), inc,
      "doc_id", 16, 32)
    assert(pruned.orderBy("new_id", "index_id").collect().toSeq ==
      full.orderBy("new_id", "index_id").collect().toSeq)
  }

  test("retireGraceMs: a reader pinned on pre-merge files survives the compact; expired retirees reap") {
    val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
    BandIndex.write(Dedup.bandBuckets(sigs(corpus), "doc_id", 16, 32,
      as = "index_id"), root, "bucket", targetRowsPerFile = 64)
    // the cross-process reader: it resolved the PRE-merge manifest
    // and holds concrete file paths
    val preFiles = hfs.listStatus(hp(root))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString).toSeq
    val pinnedCount = spark.read.parquet(preFiles: _*).count()
    def appendBatch(id: Long): Unit =
      Dedup.bandBuckets(sigs(Seq((id, (1 to 40).map(j => s"g${id}_$j")
          .mkString(" "))).toDF("doc_id", "text")),
        "doc_id", 16, 32, as = "index_id")
        .write.mode("append").parquet(root)
    appendBatch(900L)
    val inc = sigs(incoming)
    val before = BandIndex.probe(root, inc, "doc_id", 16, 32)._1
      .orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(BandIndex.compactTiered(spark, root, "bucket",
      targetRowsPerFile = 64, minTailFiles = 1,
      retireGraceMs = 3600000L).isDefined)
    // the merge retired (not deleted) its originals: the pinned
    // reader re-reads its exact paths, zero FileNotFound
    assert(spark.read.parquet(preFiles: _*).count() == pinnedCount,
      "grace-held originals must stay readable at their paths")
    val retired = BandIndex.readRetired(spark, root)
    assert(retired.nonEmpty && retired.forall(_.at > 0L))
    assert(retired.forall(re => re.exp >= re.at + 3600000L),
      "the retire must persist its own grace as an absolute expiry")
    // new probes are blind to the retirees: no duplicate candidates,
    // results identical, nothing counted as tail
    val (after, st) = BandIndex.probe(root, inc, "doc_id", 16, 32)
    assert(st.tailFiles == 0, s"retired files surfaced as tail: $st")
    assert(after.orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == before,
      "grace-held compaction changed probe results")
    // a further compact INSIDE the grace keeps holding them (and must
    // not re-merge them — the index would silently double). The dial
    // here is 0 — StreamAdmit's write-path default — which is exactly
    // the hazard: the reap clock is the expiry STORED at retire time,
    // never the later call's (shorter) grace, so a routine grace-0
    // compact cannot cut short a grace a prior compact promised.
    appendBatch(901L)
    assert(BandIndex.compactTiered(spark, root, "bucket",
      targetRowsPerFile = 64, minTailFiles = 1).isDefined)
    assert(retired.map(_.file).forall(n => hfs.exists(hp(s"$root/$n"))),
      "a grace-0 compact reaped files still inside their stored grace")
    assert(BandIndex.readRetired(spark, root).map(_.file).toSet ==
      retired.map(_.file).toSet,
      "a grace-0 compact dropped in-grace retirees from the manifest")
    // once the STORED expiry passes (simulated by rewriting the
    // stamps — the manifest is the clock), the next compact's plan
    // reaps them and empties the list
    BandIndex.commitManifest(spark, root, "bucket",
      BandIndex.readEntries(spark, root, "bucket"),
      BandIndex.readRetired(spark, root).map(_.copy(exp = 1L)))
    appendBatch(902L)
    assert(BandIndex.compactTiered(spark, root, "bucket",
      targetRowsPerFile = 64, minTailFiles = 1).isDefined)
    assert(BandIndex.readRetired(spark, root).isEmpty,
      "post-grace compact must clear the retired list")
    assert(retired.map(_.file).forall(n => !hfs.exists(hp(s"$root/$n"))),
      "post-grace compact left reaped files on disk")
    val (fin, st2) = BandIndex.probe(root, inc, "doc_id", 16, 32)
    assert(st2.tailFiles == 0)
    assert(fin.orderBy("new_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == before)
  }

  test("planned merge crash mid-commit: recover rolls forward, no loss, no duplicates") {
    def crashCase(applyOneRename: Boolean): Unit = {
      val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
      BandIndex.write(Dedup.bandBuckets(sigs(corpus), "doc_id", 16, 32,
        as = "index_id"), root, "bucket", targetRowsPerFile = 64)
      val nd = Seq((900L, (1 to 40).map(j => s"c1_$j").mkString(" ")))
        .toDF("doc_id", "text")
      Dedup.bandBuckets(sigs(nd), "doc_id", 16, 32, as = "index_id")
        .write.mode("append").parquet(root)
      val expected = spark.read.parquet(root)
        .orderBy("bucket", "index_id", "band").collect().toSeq
      // fabricate the crash: merged run written to tmp, plan committed,
      // process dies before (or partway through) applying it
      val entries = BandIndex.readEntries(spark, root, "bucket")
      val manifested = entries.map(_.file).toSet
      val tailNames = hfs.listStatus(hp(root))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(_.getPath.getName).filterNot(manifested).toSeq.sorted
      assert(tailNames.nonEmpty)
      val tmpDir = root + "__compacting"
      spark.read.parquet(tailNames.map(n => s"$root/$n"): _*)
        .repartitionByRange(1, col("bucket")).sortWithinPartitions("bucket")
        .write.mode("overwrite").parquet(tmpDir)
      val tmpParts = hfs.listStatus(hp(tmpDir))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      val adds = tmpParts.map(s =>
        s.getPath.getName -> s"r9-${s.getPath.getName}").toSeq
      val ranges = spark.read.parquet(tmpParts.map(_.getPath.toString): _*)
        .groupBy(col("_metadata.file_name").as("f"))
        .agg(min("bucket").as("mn"), max("bucket").as("mx")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val newEntries = adds.map { case (from, to) =>
        BandIndex.FileEntry(to, ranges(from)._1, ranges(from)._2, 9L)
      }
      BandIndex.writePlan(spark, tmpDir, "bucket", adds, tailNames,
        entries ++ newEntries)
      if (applyOneRename)
        assert(hfs.rename(hp(s"$tmpDir/${adds.head._1}"),
          hp(s"$root/${adds.head._2}")))
      BandIndex.recover(spark, root)
      assert(!hfs.exists(hp(tmpDir)), "recover left the tmp dir")
      val healed = spark.read.parquet(root)
        .orderBy("bucket", "index_id", "band").collect().toSeq
      assert(healed == expected,
        s"roll-forward lost or duplicated rows (${healed.size} vs ${expected.size})")
      val (_, st) = BandIndex.readForKeys(spark, root,
        Array(spark.read.parquet(root).select("bucket").first().getLong(0)),
        "bucket")
      assert(st.tailFiles == 0, s"rolled-forward index has a tail: $st")
    }
    crashCase(applyOneRename = false)
    crashCase(applyOneRename = true)
  }

  test("compact crash mid-swap: recover rolls forward or back, never loses the index") {
    val root = Files.createTempDirectory("graft_bandidx").toString + "/idx"
    val buckets = Dedup.bandBuckets(sigs(corpus), "doc_id", 16, 32,
      as = "index_id")
    BandIndex.write(buckets, root, "bucket", targetRowsPerFile = 64)
    val want = spark.read.parquet(root).count()
    // crash point A: live renamed aside, tmp complete — roll forward
    val tmp = root + "__compacting"
    spark.read.parquet(root).write.mode("overwrite").parquet(tmp)
    assert(hfs.rename(hp(root), hp(root + "__old")))
    BandIndex.recover(spark, root)
    assert(spark.read.parquet(root).count() == want)
    assert(!hfs.exists(hp(tmp)) && !hfs.exists(hp(root + "__old")))
    // crash point B: live renamed aside, tmp has no _SUCCESS — roll back
    hfs.mkdirs(hp(tmp))
    assert(hfs.rename(hp(root), hp(root + "__old")))
    BandIndex.recover(spark, root)
    assert(spark.read.parquet(root).count() == want)
    assert(!hfs.exists(hp(tmp)) && !hfs.exists(hp(root + "__old")))
  }

  test("streaming admission under continuous compaction: bounded files, admissions unchanged") {
    // the st6 contract across N=24 micro-batches with an aggressive
    // compaction trigger vs no compaction at all: identical admitted
    // sets, and the compacted index's file count stays bounded while
    // the uncompacted one grows linearly with batches
    def run(root: String, minTail: Int): Seq[(Long, Long)] = {
      StreamAdmit.seedIndex(sigs(corpus), "doc_id", s"$root/index", 16, 32,
        targetRowsPerFile = 64)
      (0 until 24).foreach { b =>
        // batch b: one fresh doc + (every 3rd batch) a near-dup of a
        // corpus doc that must be rejected
        val fresh = Seq((1000L + b,
          (1 to 40).map(j => s"f${b}_$j").mkString(" ")))
        val rows = if (b % 3 == 0)
          fresh :+ ((2000L + b,
            (1 to 40).map(j => s"c${b % 40 + 1}_$j").mkString(" ")))
          else fresh
        StreamAdmit.admitBatch(rows.toDF("doc_id", "text"), "doc_id",
          "text", s"$root/index", s"$root/admitted", b, 16, 32, 3, 0.5,
          compactMinTailFiles = minTail)
      }
      spark.read.parquet(s"$root/admitted").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val rootA = Files.createTempDirectory("graft_bandidx").toString + "/a"
    val rootB = Files.createTempDirectory("graft_bandidx").toString + "/b"
    val compacted = run(rootA, minTail = 4)
    val uncompacted = run(rootB, minTail = 1000000)
    assert(compacted == uncompacted,
      s"compaction changed admissions: $compacted vs $uncompacted")
    assert(compacted.count(_._1 >= 2000L) == 0 &&
      compacted.count(_._1 >= 1000L) == 24,
      s"admission verdicts wrong: $compacted")
    def files(r: String) = hfs.listStatus(hp(s"$r/index/buckets"))
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    assert(files(rootA) < files(rootB) / 2,
      s"compaction did not bound files: ${files(rootA)} vs ${files(rootB)}")
  }

  test("admitBatch big-batch dial: shuffle path admits identically to the pruned path") {
    // same batches through both screening paths — maxProbeKeys=1
    // forces every batch onto the distributed (probeLarge + full-sig
    // join) path that a backfill-scale batch would take
    def run(root: String, cap: Long): Seq[(Long, Long)] = {
      StreamAdmit.seedIndex(sigs(corpus), "doc_id", s"$root/index", 16, 32,
        targetRowsPerFile = 64)
      (0 until 6).foreach { b =>
        val fresh = Seq((1000L + b,
          (1 to 40).map(j => s"f${b}_$j").mkString(" ")))
        val rows = if (b % 2 == 0)
          fresh :+ ((2000L + b,
            (1 to 40).map(j => s"c${b % 40 + 1}_$j").mkString(" ")))
          else fresh
        StreamAdmit.admitBatch(rows.toDF("doc_id", "text"), "doc_id",
          "text", s"$root/index", s"$root/admitted", b, 16, 32, 3, 0.5,
          maxProbeKeys = cap)
      }
      spark.read.parquet(s"$root/admitted").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val rootA = Files.createTempDirectory("graft_bandidx").toString + "/a"
    val rootB = Files.createTempDirectory("graft_bandidx").toString + "/b"
    val pruned = run(rootA, cap = 1L << 22)
    val shuffled = run(rootB, cap = 1L)
    assert(pruned == shuffled,
      s"the screening paths disagree: $pruned vs $shuffled")
    assert(pruned.count(_._1 >= 2000L) == 0 && pruned.nonEmpty,
      s"admission verdicts wrong: $pruned")
  }

  test("seedIndexPlanned: solved banding holds candidates-per-doc ~flat across 10x corpus growth") {
    // docs drawn from a shared 3-token-phrase pool, so unrelated pairs
    // carry real background shingle similarity (the regime the
    // S-curve dial exists for — disjoint-vocabulary docs never
    // collide and any banding looks flat)
    val phrases = (0 until 100).map(i => s"p${i}a p${i}b p${i}c")
    def mkDocs(n: Int, seed: Int, idBase: Long) = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(i => (idBase + i,
        Seq.fill(12)(phrases(rnd.nextInt(phrases.length))).mkString(" ")))
        .toDF("doc_id", "text")
    }
    val batch = mkDocs(20, seed = 999, idBase = 1000000L)
    // candidates per batch doc against an index of n docs seeded with
    // the given config (solved per-size, or deliberately pinned)
    def candPerDoc(n: Int, root: String,
        pin: Option[(Int, Int)]): Double = {
      val corpus = mkDocs(n, seed = n, idBase = 0L)
      pin match {
        case Some((bands, sigLen)) =>
          StreamAdmit.seedIndex(Dedup.minhash(corpus, "text", 3, sigLen)
            .select("doc_id", "minhash"), "doc_id", s"$root/index",
            bands, sigLen, targetRowsPerFile = 512)
          StreamAdmit.writeConfig(spark, s"$root/index",
            StreamAdmit.IndexConfig(bands, sigLen, 3))
        case None =>
          StreamAdmit.seedIndexPlanned(corpus, "doc_id", "text",
            s"$root/index", targetSim = 0.8, shingleK = 3,
            targetRowsPerFile = 512)
      }
      val cfg = StreamAdmit.loadConfig(spark, s"$root/index").get
      val sigs = Dedup.minhash(batch, "text", cfg.shingleK, cfg.sigLen)
        .select("doc_id", "minhash")
      val (pairs, _) = BandIndex.probe(s"$root/index/buckets", sigs,
        "doc_id", cfg.bands, cfg.sigLen)
      pairs.count().toDouble / 20
    }
    val base = Files.createTempDirectory("graft_planned").toString
    val small = candPerDoc(300, s"$base/s", pin = None)
    val big = candPerDoc(3000, s"$base/b", pin = None)
    // the small corpus's SOLVED config frozen onto the 10x corpus —
    // what "pin once, grow the corpus" costs
    val smallPlan = graft.ops.Dedup.bandingPlan(300L, targetSim = 0.8)
    val pinned = candPerDoc(3000, s"$base/p",
      pin = Some((smallPlan.bands, smallPlan.sigLen)))
    info(s"solved small=$small big=$big; small-config-on-big=$pinned")
    // solved configs: candidates-per-doc stays within the budget's
    // ballpark at both sizes (flat); the frozen config pays ~linear
    // growth on the same data
    assert(big <= small * 3 + 3,
      s"solved banding did not hold candidates flat: $small -> $big")
    assert(pinned > big * 2,
      s"pinned config should degrade vs solved at 10x: $pinned vs $big")
  }
}
