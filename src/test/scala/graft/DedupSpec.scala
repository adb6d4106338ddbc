package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** MinHash-LSH recall vs exact Jaccard; simhash Hamming-pair
  * detection; inverted-index Jaccard equals the all-pairs formulation. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 15 base docs; each gets a near-duplicate with one word changed
  private val base = (1 to 15).map { i =>
    val words = (1 to 40).map(j => s"w${i}_$j")
    (i.toLong, words.mkString(" "))
  }
  private val docs = (base ++ base.map { case (i, t) =>
    (i + 100L, t.replaceFirst("_5 ", "_5x "))
  }).toDF("doc_id", "text")

  test("exact jaccard pairs (inverted index) == all-pairs formulation") {
    val viaIndex = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSeq
    val a = docs.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val allPairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jac", Dedup.ngramJaccard(col("ta"), col("tb"), 3))
      .filter(col("jac") >= 0.2)
      .select("id_a", "id_b", "jac")
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSeq
    assert(viaIndex == allPairs && viaIndex.size == 15)
  }

  test("prefix-filtered jaccard pairs == plain inverted-index path") {
    // multiple thresholds, including boundary-prone ones (t*n integral)
    // and docs of uneven length so the length filter is exercised
    val uneven = docs.union(Seq(
      (300L, (1 to 40).map(j => s"w1_$j").mkString(" ") + " tail extra"),
      (301L, (1 to 10).map(j => s"w1_$j").mkString(" "))
    ).toDF("doc_id", "text"))
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9, 0.95)) {
      val plain = Dedup.ngramJaccardPairs(uneven, "doc_id", "text", 3, t)
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSeq
      val prefixed = Dedup.ngramJaccardPairsPrefix(uneven, "doc_id", "text", 3, t)
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSeq
      assert(prefixed == plain, s"prefix path diverged at t=$t")
    }
    // sanity: the high-recall threshold actually finds the near-dup pairs
    val found = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.7)
      .count()
    assert(found == 15L)
  }

  test("prefix-filtered path indexes only prefixes (posting volume cut)") {
    // structural check on the plan input, not timing: at t=0.9 each
    // 40-word doc (38 trigrams) should explode ~⌈0.1*38⌉+1 = 5 prefix
    // hashes, not 38 — assert via the exploded row count
    val shingled = docs.select(col("doc_id"),
      graft.functions.ShingleHashesExpr(col("text"), 3).as("g"))
    val full = shingled.select(explode(col("g"))).count()
    val t = 0.9
    val prefixLen = shingled.select(
      (size(col("g")) - ceil(size(col("g")) * lit(t) - lit(1e-9)) + lit(1))
        .cast("long").as("p"))
      .agg(sum("p")).as[Long].head()
    assert(prefixLen * 5 < full,
      s"prefix posting volume $prefixLen not <20% of full $full")
  }

  test("bandingPlan: recall holds, candidates bounded, dial turns with scale") {
    val small = Dedup.bandingPlan(corpusSize = 1000000L, targetSim = 0.8)
    val big = Dedup.bandingPlan(corpusSize = 1000000000L, targetSim = 0.8)
    for (p <- Seq(small, big)) {
      assert(p.recallAtTarget >= 0.9)
      assert(p.expectedFalseCandidatesPerDoc <= 10.0)
      // the plan's own numbers re-derive from the S-curve formula
      val pT = math.pow(0.8, p.rowsPerBand)
      assert(math.abs(p.recallAtTarget - (1 - math.pow(1 - pT, p.bands))) < 1e-12)
    }
    // 1000x corpus growth must widen the bands (more rows per band) —
    // the log(G) law from PLANS.md round 4 — and stay implementable
    assert(big.rowsPerBand > small.rowsPerBand)
    assert(big.sigLen <= 4096)
    // the shipped d2 demo config (16 bands x 2 rows) is in the family
    // this solves for small corpora: solver at 10k docs stays modest
    val demo = Dedup.bandingPlan(corpusSize = 10000L, targetSim = 0.8)
    assert(demo.sigLen <= small.sigLen)
  }

  test("bandingPlan refuses configs it cannot solve honestly") {
    // high background vs target: the honest band count explodes past
    // any practical signature width — must throw, not Int-clamp into
    // a plan whose true recall is a fraction of the ask
    val e = intercept[IllegalArgumentException] {
      Dedup.bandingPlan(corpusSize = 1000000000L, targetSim = 0.5,
        backgroundSim = 0.3)
    }
    assert(e.getMessage.contains("budget"))
  }

  test("minhash LSH recall >= 0.9 on true near-dup pairs") {
    val sig = Dedup.minhash(docs, "text", shingleK = 3, numHashes = 32)
    val cands = Dedup.lshCandidates(sig, "doc_id", bands = 16, sigLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = (1 to 15).map(i => (i.toLong, i + 100L)).toSet
    val recall = truth.count(cands.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall, candidates ${cands.size}")
  }

  test("minhash estimated jaccard tracks exact jaccard") {
    val sig = Dedup.minhash(docs, "text", shingleK = 3, numHashes = 32)
    val cands = Dedup.lshCandidates(sig, "doc_id", bands = 16, sigLen = 32)
    val est = Dedup.minhashJaccard(cands, sig, "doc_id")
      .filter(col("id_a") === 1L && col("id_b") === 101L)
      .collect()
    est.foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      assert(e > 0.5, s"near-dup pair estimated at $e") // true jac ~0.92
    }
  }

  test("simhash: near-dups within a few Hamming bits, banding finds them") {
    val withSim = Dedup.simhash(docs, "text")
    val sims = withSim.select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearHam = (1 to 15).map(i => ham(sims(i.toLong), sims(i + 100L)))
    assert(nearHam.max <= 12, s"near-dup hamming distances: $nearHam")
    // banded candidate join at maxDist covering the observed distances
    val pairs = Dedup.simhashPairs(withSim, "doc_id", "simhash", maxDist = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = (1 to 15).map(i => (i.toLong, i + 100L)).toSet
    // pigeonhole guarantee only holds for maxDist = chunks-1; with 13
    // chunks of ~4 bits a <=12-bit pair always shares a chunk
    assert(truth.subsetOf(pairs), s"missed ${truth -- pairs}")
  }

  test("ShingleHashesExpr == transform(wordShingles, xxhash64) exactly") {
    import graft.functions.{ShingleHashesExpr, TextFunctions}
    val samples = Seq("one two three four five", "a b", "", "  padded   text  here ",
      "x\ty\nz w", "dup dup dup dup dup", "single").toDF("text")
    val out = samples.select(
      ShingleHashesExpr(col("text"), 3).as("fused"),
      transform(TextFunctions.wordShingles(col("text"), 3),
        s => xxhash64(s)).as("dsl")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fused ${r.getSeq[Long](0)} vs dsl ${r.getSeq[Long](1)}")
    }
  }

  test("NormalizeTextExpr == regexp_replace(lower(trim(text)), \\s+, ' ')") {
    import graft.functions.NormalizeTextExpr
    val samples = Seq("  Hello   World  ", "a\t\tb\nc", "\tleading tab",
      "MiXeD  CASE", "", "   ", "one", "trail\r\n").toDF("text")
    val out = samples.select(
      NormalizeTextExpr(col("text")).as("fused"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("regex"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"'${r.getString(0)}' != '${r.getString(1)}'"))
  }

  test("winnowing: copied paragraph shares fingerprints, guarantee holds") {
    import graft.ops.Dedup
    val para = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, s"intro text one two three. $para. closing remarks here."),
      (2L, s"completely different opening. $para. different ending too."),
      (3L, "nothing in common with the others at all, none whatsoever"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"shared paragraph not detected: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // identical text → identical fingerprint sets
    val same = Seq((1L, para), (2L, para)).toDF("doc_id", "text")
    val fp = Dedup.winnow(same, "text").select("fingerprints")
      .collect().map(_.getSeq[Long](0).toSet)
    assert(fp(0) == fp(1) && fp(0).nonEmpty)
  }

  test("exact dedup groups identical normalized text") {
    val d = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(d, "doc_id", "text")
      .select("doc_id", "dup_count").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
  }

  test("connectedComponents labels every vertex with its component min") {
    // chain 1-2-3, pair 10-11, singleton 20, and a 16-node path
    // (worst-case diameter — exercises the pointer-jumping rounds)
    val path = (100L until 115L).map(i => (i, i + 1))
    val edges = (Seq((2L, 1L), (2L, 3L), (10L, 11L)) ++ path)
      .toDF("id_a", "id_b")
    val verts = (Seq(1L, 2L, 3L, 10L, 11L, 20L) ++ (100L to 115L))
      .toDF("doc_id")
    val got = Dedup.connectedComponents(verts, "doc_id", edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(20L) == 20L)
    assert((100L to 115L).forall(got(_) == 100L))
    assert(got.size == verts.count())
  }

  test("connectedComponents equals driver union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt)); if (ra != rb) parent(ra) = rb
      }
      val expected = (0 until n).groupBy(find).values
        .flatMap(g => g.map(v => v.toLong -> g.map(_.toLong).min)).toMap
      val got = Dedup.connectedComponents(
          (0 until n).map(_.toLong).toDF("id"), "id", edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial n=$n edges=${edges.size}")
    }
  }

  test("connectedComponents output plan stays flat (localCheckpoint rounds)") {
    val verts = (0L until 50L).toDF("id")
    val edges = (0L until 49L).map(i => (i, i + 1)).toDF("id_a", "id_b") // a 50-chain
    val cc = Dedup.connectedComponents(verts, "id", edges)
    val plan = cc.queryExecution.optimizedPlan.toString
    // a persist-based implementation nests every round's plan (twice per
    // round) here; the checkpointed one is a single flat RDD scan
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"), plan.take(500))
    assert(plan.length < 20000, s"CC plan string blew up: ${plan.length} chars")
    assert(cc.select("cluster_id").distinct().count() == 1) // one component
  }

  test("lshCandidatesPlanned: solved banding holds candidates-per-doc ~flat across 10x corpus growth") {
    // docs drawn from a shared phrase pool so unrelated pairs carry
    // real background shingle similarity (the regime the dial exists
    // for), plus planted near-dup partners that must stay found —
    // the BATCH-path twin of StreamAdmit.seedIndexPlanned's spec
    val phrases = (0 until 100).map(i => s"p${i}a p${i}b p${i}c")
    def mkDocs(n: Int, seed: Int) = {
      val rnd = new scala.util.Random(seed)
      val base = (0 until n).map(i => (i.toLong,
        Seq.fill(12)(phrases(rnd.nextInt(phrases.length))).mkString(" ")))
      val planted = base.filter(_._1 % 50 == 0).map { case (i, t) =>
        (1000000L + i, t.split(" ").dropRight(2).mkString(" ") + " zz yy")
      }
      (base ++ planted).toDF("doc_id", "text")
    }
    def measure(n: Int, pin: Option[(Int, Int)]): (Double, Long) = {
      val docs = mkDocs(n, seed = n)
      val nd = docs.count()
      val (pairs, bands, sigLen) = pin match {
        case Some((b, s)) =>
          val sigs = Dedup.minhash(docs, "text", 3, s)
          (Dedup.lshCandidates(sigs, "doc_id", b, s), b, s)
        case None =>
          val (p, plan) = Dedup.lshCandidatesPlanned(docs, "doc_id",
            "text", targetSim = 0.8)
          (p, plan.bands, plan.sigLen)
      }
      val planted = pairs.filter(col("id_b") >= 1000000L &&
        col("id_b") - 1000000L === col("id_a")).count()
      (pairs.count().toDouble / nd, planted)
    }
    val (smallRate, smallPlanted) = measure(300, pin = None)
    val (bigRate, bigPlanted) = measure(3000, pin = None)
    // recall first: every planted partner must surface at both sizes
    assert(smallPlanted == 300 / 50 && bigPlanted == 3000 / 50,
      s"solved banding lost planted near-dups: $smallPlanted/$bigPlanted")
    // solved configs hold candidates-per-doc in the same ballpark
    // across 10x growth on the batch path
    assert(bigRate <= smallRate * 3 + 3,
      s"solved banding did not hold candidates flat: $smallRate -> $bigRate")
    // the small corpus's config frozen onto the big corpus pays the
    // linear collision growth the solver exists to avoid
    val smallPlan = Dedup.bandingPlan(300L, targetSim = 0.8)
    val (pinnedRate, _) = measure(3000,
      pin = Some((smallPlan.bands, smallPlan.sigLen)))
    info(s"solved small=$smallRate big=$bigRate pinned-on-big=$pinnedRate")
    assert(pinnedRate > bigRate * 2,
      s"pinned config should degrade vs solved at 10x: $pinnedRate vs $bigRate")
  }

  test("segmentDedup: first occurrence survives, later copies drop, order holds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),       // segs (w=2): "a b", "c d"
      (2L, "a b x y"),       // "a b" is doc 1's — dropped; "x y" kept
      (3L, "a b c d"),       // everything already owned — emptied
      (4L, "c d a b e")      // both owned by doc 1; tail "e" is new
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", w = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 2L, 2L, "a b c d")))
    assert(out(1) == ((2L, 2L, 1L, "x y")))
    assert(out(2) == ((3L, 2L, 0L, "")))
    // doc 4's segments are "c d", "a b", "e": the first two are owned
    // by doc 1 (by SEGMENT CONTENT, position-independent), "e" survives
    assert(out(3) == ((4L, 3L, 1L, "e")))
  }

  test("segmentDedup: unique corpus is identity; rerun is idempotent") {
    import spark.implicits._
    val docs = Seq(
      (10L, "q w e r t y u i o p"),
      (11L, "z x c v b n m k l j")
    ).toDF("doc_id", "text")
    val once = Dedup.segmentDedup(docs, "doc_id", "text", w = 3)
    val o = once.orderBy("doc_id").collect()
    assert(o.map(_.getString(3)).toSeq ==
      Seq("q w e r t y u i o p", "z x c v b n m k l j"))
    assert(o.forall(r => r.getLong(1) == r.getLong(2)))
    val twice = Dedup.segmentDedup(
      once.select(col("doc_id"), col("text_dedup").as("text")),
      "doc_id", "text", w = 3).orderBy("doc_id").collect()
    assert(twice.map(_.getString(3)).toSeq == o.map(_.getString(3)).toSeq,
      "second pass must be a no-op on already-deduped text")
  }
}
