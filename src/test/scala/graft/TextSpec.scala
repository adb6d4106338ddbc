package graft

import graft.functions.{Fnv1a64Expr, TextFunctions}
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Language-ID accuracy, fingerprint expression equivalence, quality
  * signal sanity. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies stopword-bearing text per language") {
    val samples = Text.stopwords.toSeq.flatMap { case (lang, words) =>
      (1 to 5).map { i =>
        val filler = (1 to 6).map(j => s"zz$i$j")
        (lang, (words.take(6) ++ filler).mkString(" "))
      }
    }
    val out = samples.toDF("lang", "text")
      .withColumn("pred", Text.langId(col("text")))
      .collect()
    val acc = out.count(r => r.getString(0) == r.getString(2)).toDouble / out.length
    assert(acc >= 0.9, s"langId accuracy $acc")
  }

  test("langId falls back to 'und' on stopword-free text") {
    val out = Seq("qqq www eee rrr").toDF("text")
      .select(Text.langId(col("text"))).collect()(0).getString(0)
    assert(out == "und")
  }

  test("fingerprint codegen expression == column-expression FNV for ASCII") {
    val docs = Seq("Hello World", "  spaced   out  ", "MiXeD Case 123",
      "punct! (and) [more]", "a").toDF("text")
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val out = docs.select(
      Fnv1a64Expr(norm).as("expr"),
      TextFunctions.fnv1a64(norm).as("cols")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("gopherGate: each published rule trips on its own violation") {
    import spark.implicits._
    // 60 tokens, mean len in [3,10], no punctuation, stopwords present
    val good = (Seq.fill(29)("the data") :+ "value row").mkString(" ")
    val short = "the a short doc here"                   // < 50 words
    val thin = (Seq.fill(30)("a it") :+ "x y").mkString(" ") // mean len < 3
    val symbols = (Seq.fill(25)("the !!! data ###")).mkString(" ") // punct
    val numeric = (Seq.fill(25)("the 42 11 99")).mkString(" ")     // alpha<0.8
    val noStops = (1 to 60).map(i => s"tok$i").mkString(" ")       // 0 stops
    val out = Seq(
      (1L, good), (2L, short), (3L, thin),
      (4L, symbols), (5L, numeric), (6L, noStops)
    ).toDF("doc_id", "text")
    val g = graft.ops.Text.gopherGate(out, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = g(i)
    assert(row(0).getAs[Boolean]("keep"), "good doc must pass every rule")
    assert(!row(1).getAs[Boolean]("f_words") && !row(1).getAs[Boolean]("keep"))
    assert(!row(2).getAs[Boolean]("f_meanlen"))
    assert(!row(3).getAs[Boolean]("f_punct"))
    assert(!row(4).getAs[Boolean]("f_alpha"))
    assert(!row(5).getAs[Boolean]("f_stops") &&
      row(5).getAs[Int]("n_stop_hits") == 0)
  }

  test("gopherKeep column == gopherGate's keep flag row-for-row") {
    import spark.implicits._
    val docs = Seq(
      (1L, (Seq.fill(29)("the data") :+ "value row").mkString(" ")),
      (2L, "the a short doc"),
      (3L, (Seq.fill(30)("a it") :+ "x y").mkString(" ")),
      (4L, (1 to 60).map(i => s"tok$i").mkString(" "))
    ).toDF("doc_id", "text")
    val viaGate = graft.ops.Text.gopherGate(docs, "doc_id", "text")
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaKeep = docs.select(col("doc_id"),
        graft.ops.Text.gopherKeep(col("text")).as("k")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaGate == viaKeep)
  }

  test("fingerprint diverges from code-point fold only on non-ASCII") {
    // the codegen expr folds UTF-8 bytes (canonical FNV); the column
    // formulation folds code points — documents the known difference
    val out = Seq("héllo").toDF("text").select(
      Fnv1a64Expr(col("text")).as("expr"),
      TextFunctions.fnv1a64(col("text")).as("cols")).collect()(0)
    assert(out.getLong(0) != out.getLong(1))
  }

  test("fnv1a64 scalar matches a known vector") {
    // FNV-1a 64 of "a" = 0xaf63dc4c8601ec8c
    assert(Fnv1a64Expr.hash("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
  }

  test("quality signals: token counts, ratios, bounded score") {
    val out = Text.withQualitySignals(
        Seq("The quick brown fox, it is said, jumps over the lazy dog.")
          .toDF("text"), "text")
      .collect()(0)
    assert(out.getAs[Int]("n_tokens") == 12)
    val q = out.getAs[Double]("quality")
    assert(q >= 0.0 && q <= 1.0)
    assert(out.getAs[Double]("en_stopword_ratio") > 0.2)
  }

  test("TextStatsExpr quality signals == composed TextFunctions formulation") {
    import graft.functions.TextFunctions._
    val samples = Seq(
      "The quick brown fox, jumps; over!! the lazy dog.",
      "", "   ", "x", "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "!!! ??? ... ;;; :::", "word", "two words",
      "tabs\tand\nnewlines\rand  runs   of spaces",
      "punct-heavy (a) [b] {c} <d> \"e\" 'f' g@h i#j k$l",
      "MiXeD CaSe The Of And to in is that it for",
      "caf\u00e9 na\u00efve \u4e2d\u6587 \u6587\u6863 unicode \u00fcml\u00e4ut",
      (1 to 200).map(i => s"tok$i").mkString(" "))
    val df = samples.toDF("text")
    val fused = Text.withQualitySignals(df, "text")
      .select("n_tokens", "mean_token_len", "punct_ratio",
        "en_stopword_ratio", "quality").collect()
    val t = col("text")
    val composed = df
      .withColumn("n_tokens", tokenCountWs(t))
      .withColumn("mean_token_len", round(meanTokenLen(t), 6))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("en_stopword_ratio",
        round(stopwordRatio(t, Text.stopwords("en")), 6))
      .withColumn("quality", roundHalfUp6(qualityScore(t, Text.stopwords("en"))))
      .select("n_tokens", "mean_token_len", "punct_ratio",
        "en_stopword_ratio", "quality").collect()
    fused.zip(composed).zipWithIndex.foreach { case ((f, c), i) =>
      assert(f == c, s"row $i (text='${samples(i).take(40)}'): fused $f != composed $c")
    }
  }

  test("repetitionSignals: hand-computed fractions on crafted docs") {
    val docs = Seq(
      (1L, "spam spam spam spam"),            // one word repeated 4x
      (2L, "all words here are unique"),      // no repetition
      (3L, "ab cd ab cd ab cd xy"),           // dominant "ab cd" bigram
      (4L, "single"),                         // no bigrams/trigrams
      (5L, "  leading   and trailing   "))    // whitespace robustness
      .toDF("doc_id", "text")
    val got = Text.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    // doc 1: 4 words 1 distinct → dup 3/4; top bigram "spam spam" (9
    // chars) occurs 3x → 27/19 > 1 is fine (occurrences overlap); top
    // trigram 14 chars x 2 = 28/19
    assert(got(0)._1 == 1L && got(0)._2 == 4)
    assert(got(0)._3 == 0.75)
    assert(got(0)._4 == math.floor(27.0 / 19 * 1e6 + 0.5) / 1e6)
    assert(got(0)._5 == math.floor(28.0 / 19 * 1e6 + 0.5) / 1e6)
    // doc 2: all distinct
    assert(got(1)._3 == 0.0)
    // doc 3: "ab cd" occurs 3x (5 chars) = 15; "cd ab" 2x = 10
    assert(got(2)._4 == math.floor(15.0 / 20 * 1e6 + 0.5) / 1e6)
    // doc 4: no n-grams → zero fractions
    assert(got(3)._2 == 1 && got(3)._4 == 0.0 && got(3)._5 == 0.0)
    // doc 5: tokenizer drops empties → 3 words, all distinct
    assert(got(4)._2 == 3 && got(4)._3 == 0.0)
  }

  test("bigramInterpolatedNll: hand-computed probabilities on a tiny model") {
    // train: "a b" x2 and "a c" → uni: a=3 b=2 c=1 (total 6, V=3);
    //        bigrams: (a,b)=2, (a,c)=1 → ctx a=3
    val train = Seq((0L, "a b"), (2L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b"),   // seen bigram: .7*(2/3) + .3*(3/9)
      (3L, "a z"),   // seen ctx, unseen tok: .7*0... cb null → 0 + .3*(1/9)
      (5L, "z a"),   // unseen ctx: 0 + .3*(4/9)
      (7L, "b"))     // single token → dropped
      .toDF("doc_id", "text")
    val got = Text.bigramInterpolatedNll(train, score, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // Spark's round() is BigDecimal HALF_UP, not the micros floor
    def nll(p: Double) = java.math.BigDecimal.valueOf(-math.log(p))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got.map(_._1) == List(1L, 3L, 5L), "doc 7 must drop (no bigram)")
    assert(got.forall(_._2 == 1L))
    assert(got(0)._3 == nll(0.7 * (2.0 / 3.0) + 0.3 * ((2 + 1.0) / 9.0)))
    assert(got(1)._3 == nll(0.3 * ((0 + 1.0) / 9.0)))
    assert(got(2)._3 == nll(0.3 * ((3 + 1.0) / 9.0)))
  }

  test("dsirWeights: target-like docs outweigh pool-only; micros exact") {
    val target = Seq((0L, "aa bb"), (1L, "aa cc")).toDF("doc_id", "text")
    val pool = Seq((0L, "aa bb"), (1L, "aa cc"),
      (2L, "zz yy"), (3L, "zz xx")).toDF("doc_id", "text")
    val score = Seq((10L, "aa bb aa"), (11L, "zz yy zz"))
      .toDF("doc_id", "text")
    val B = 64
    val got = graft.ops.Text
      .dsirWeights(target, pool, score, "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // independent re-derivation: same featurization and hash, but the
    // model math in plain driver-side Scala
    def grams(t: String): Seq[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val tDocs = Seq("aa bb", "aa cc")
    val pDocs = tDocs ++ Seq("zz yy", "zz xx")
    val sDocs = Map(10L -> "aa bb aa", 11L -> "zz yy zz")
    val all = (tDocs ++ pDocs ++ sDocs.values).flatMap(grams).distinct
    val bucketOf: Map[String, Long] = all.map(_ -> 0L).toDF("g", "z")
      .select(col("g"), pmod(Fnv1a64Expr(col("g")), lit(B.toLong)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def counts(docs: Seq[String]) = docs.flatMap(grams)
      .groupBy(bucketOf).map { case (b, gs) => b -> gs.size.toLong }
    val tc = counts(tDocs); val rc = counts(pDocs)
    val tT = tDocs.flatMap(grams).size; val rT = pDocs.flatMap(grams).size
    def micros(b: Long): Long = math.floor(
      (math.log((tc.getOrElse(b, 0L) + 1.0) / (tT + B)) -
       math.log((rc.getOrElse(b, 0L) + 1.0) / (rT + B))) * 1e6 + 0.5).toLong
    sDocs.foreach { case (id, t) =>
      val gs = grams(t)
      assert(got(id)._1 == gs.size, s"doc $id n_grams")
      assert(got(id)._2 == gs.map(g => micros(bucketOf(g))).sum,
        s"doc $id logw_micros")
    }
    assert(got(10L)._2 > got(11L)._2,
      s"target-like doc must outweigh pool-only doc: $got")
  }

  test("gumbelMicros: deterministic, seed-sensitive, analytically bounded") {
    val ids = (0L until 500L).toDF("id")
    def keys(seed: Long) = ids
      .select(col("id"), Text.gumbelMicros(col("id"), seed).as("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = keys(42L)
    assert(a == keys(42L), "same (id, seed) must reproduce exactly")
    val b = keys(43L)
    assert(a != b, "a different seed must redraw the noise")
    // analytic range for the 2^20 grid: g ∈ [−ln(ln(M+2)), ln((M+2)/2)]
    val m = (1L << 20) + 2
    val lo = -math.log(math.log(m.toDouble))
    val hi = math.log(m / 2.0)
    a.values.foreach(g => assert(g >= (lo * 1e6).floor.toLong &&
      g <= (hi * 1e6 + 0.5).floor.toLong, s"noise $g outside [$lo,$hi]"))
    // the noise varies (hash spreads the grid), and is centered
    // roughly like Gumbel(0,1) (mean ≈ γ ≈ 0.577): crude sanity only
    val mean = a.values.sum.toDouble / a.size / 1e6
    assert(a.values.toSet.size > 400, "hash grid collapsed")
    assert(mean > 0.2 && mean < 1.0, s"suspicious Gumbel mean $mean")
  }
}
