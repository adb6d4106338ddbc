package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis over a documents table: language ID, quality scoring,
  * token counting, fingerprinting. Everything is a native column
  * expression evaluated at scan speed — per-document work, embarrassingly
  * parallel, no shuffles except the caller's own aggregations.
  */
object Text {

  /** Tiny per-language stopword/function-word lists for the n-gram
    * heuristic language identifier. Real deployments plug in fastText &
    * co; the *engine* part — a scored argmax over per-language token
    * evidence, computed columnar — is what matters here. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** Language-ID: per-language evidence = fraction of tokens in that
    * language's function-word list; argmax with 'und' (undetermined)
    * fallback below `minScore`. One fused tokenize+count pass
    * ([[graft.functions.StopwordHitsExpr]]) feeds every language's
    * ratio — tokenizing once, not once per language. */
  def langId(text: Column, minScore: Double = 0.02): Column = {
    val langs = stopwords.toSeq.sortBy(_._1)
    val hits = graft.functions.StopwordHitsExpr(text, langs.map(_._2))
    val nTok = hits.getItem(0).cast("double")
    val scored = langs.zipWithIndex.map { case ((lang, _), i) =>
      val ratio = when(nTok === 0, 0.0)
        .otherwise(hits.getItem(i + 1).cast("double") / nTok)
      struct(round(ratio, 9).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") < minScore, "und").otherwise(best.getField("lang"))
  }

  /** Quality + shape signals a pretraining filter wants — genuinely one
    * pass now: all counting lives in the fused
    * [[graft.functions.TextStatsExpr]] kernel; the ratio/score formulas
    * below are the SAME Column arithmetic as the composed
    * `TextFunctions` forms (same operation order → bit-identical
    * doubles → the cross-engine oracle is unchanged). */
  def withQualitySignals(df: DataFrame, text: String): DataFrame = {
    val d = df.withColumn("__ts",
      graft.functions.TextStatsExpr(col(text), stopwords("en")))
    val nTok = col("__ts.nTok")
    val mean = when(nTok === 0, 0.0)
      .otherwise(col("__ts.sumTokLen").cast("double") / nTok.cast("double"))
    val punctR = when(col("__ts.nChars") === 0, 0.0)
      .otherwise(col("__ts.punct").cast("double") / col("__ts.nChars").cast("double"))
    val swR = when(col("__ts.nTokLower") === 0, 0.0)
      .otherwise(col("__ts.hits").cast("double") / col("__ts.nTokLower").cast("double"))
    val lenScore = least(nTok.cast("double") / 64.0, lit(1.0))
    val wlenScore = when(mean.between(2.5, 9.0), 1.0).otherwise(0.3)
    val punctScore = lit(1.0) - least(punctR * 4.0, lit(1.0))
    val swScore = least(swR * 5.0, lit(1.0))
    d.withColumn("n_tokens", nTok)
      .withColumn("n_chars_", col("__ts.nChars"))
      .withColumn("mean_token_len", round(mean, 6))
      .withColumn("punct_ratio", round(punctR, 6))
      .withColumn("en_stopword_ratio", round(swR, 6))
      .withColumn("quality", roundHalfUp6(
        lenScore * 0.35 + wlenScore * 0.25 + punctScore * 0.2 + swScore * 0.2))
      .drop("__ts")
  }

  /** Gopher-style repetition signals — the "is this document mostly
    * the same thing over and over" filters a pretraining pipeline runs
    * alongside quality scoring (Rae et al. 2021 §A1.1 use duplicate
    * line/paragraph and top n-gram character fractions; this corpus has
    * no line structure, so the word-level trio carries the signal):
    *
    *  - `dup_word_frac`: fraction of word occurrences that repeat an
    *    earlier word — vocabulary concentration;
    *  - `top_bigram_char_frac` / `top_trigram_char_frac`: characters
    *    covered by occurrences of the single most-repeated word 2-/3-
    *    gram, over total characters. "Most-repeated" maximizes
    *    occurrences × gram length, which is tie-free by construction
    *    (a pure numeric max), keeping the result deterministic and
    *    cross-engine reproducible.
    *
    * Scale shape: per-row word stats ride the scan (no shuffle); the
    * n-gram tops are explode → count → max — two hash aggregations per
    * n with map-side partial combine, shuffling only (id, gram-hash)-
    * sized rows. Nothing here is quadratic in document count. */
  def repetitionSignals(df: DataFrame, id: String, text: String): DataFrame = {
    val words = filter(split(col(text), "\\s+"), w => length(w) > 0)
    def grams(w: Column, n: Int): Column =
      when(size(w) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(w, i + o)): _*)))
    val base = df.select(col(id), length(col(text)).as("n_chars"),
      size(words).as("n_words"),
      size(array_distinct(words)).as("n_dwords"),
      words.as("__w"))
    def topN(n: Int, out: String): DataFrame = base
      .select(col(id), explode(grams(col("__w"), n)).as("__g"))
      .groupBy(col(id), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(id)).agg(max(col("__c") * length(col("__g"))).as(out))
    base.drop("__w")
      .join(topN(2, "__top2"), Seq(id), "left")
      .join(topN(3, "__top3"), Seq(id), "left")
      .select(col(id), col("n_words"),
        roundHalfUp6(when(col("n_words") === 0, 0.0)
          .otherwise((col("n_words") - col("n_dwords")).cast("double") /
            col("n_words").cast("double"))).as("dup_word_frac"),
        roundHalfUp6(coalesce(col("__top2"), lit(0L)).cast("double") /
          col("n_chars").cast("double")).as("top_bigram_char_frac"),
        roundHalfUp6(coalesce(col("__top3"), lit(0L)).cast("double") /
          col("n_chars").cast("double")).as("top_trigram_char_frac"))
  }

  /** Gopher-rules quality GATE (Rae et al. 2021 §A1.1) — tx2 scores
    * documents; this is the downstream pipeline stage that actually
    * admits or drops them, each published rule as an auditable flag
    * plus the conjunctive `keep`:
    *
    *  - 50 ≤ word count ≤ 100,000;
    *  - 3 ≤ mean word length ≤ 10;
    *  - symbol/punctuation character ratio ≤ 0.1 (the corpus has no
    *    `#`/`...` runs, so the punctuation-char ratio carries
    *    Gopher's symbol-to-word screen);
    *  - ≥ 80% of words contain an alphabetic character;
    *  - ≥ 2 hits from the English stop-word list.
    *
    * Per-document column arithmetic only — the counting is the same
    * fused one-pass [[graft.functions.TextStatsExpr]] kernel tx2 uses
    * (identical operation order → bit-identical ratios → one oracle
    * serves both), plus one per-token regex for the alpha-word count.
    * No shuffle: the gate rides the scan, so at 100 TB it is a free
    * passenger on whatever pass reads the text anyway. */
  /** The five Gopher rules as Column predicates over a TextStatsExpr
    * struct column — shared by the batch gate ([[gopherGate]]) and the
    * streaming admission gate ([[gopherKeep]]). */
  private def gopherFlags(ts: Column, text: Column):
      (Column, Column, Column, Column, Column, Column, Column, Column) = {
    val nTok = ts.getField("nTok")
    val mean = when(nTok === 0, 0.0)
      .otherwise(ts.getField("sumTokLen").cast("double") / nTok.cast("double"))
    val punctR = when(ts.getField("nChars") === 0, 0.0)
      .otherwise(ts.getField("punct").cast("double") /
        ts.getField("nChars").cast("double"))
    val nAlpha = size(filter(
      filter(split(text, "\\s+"), x => length(x) > 0),
      x => x.rlike("[A-Za-z]")))
    val fracAlpha = when(nTok === 0, 0.0)
      .otherwise(nAlpha.cast("double") / nTok.cast("double"))
    val fWords = nTok >= 50 && nTok <= 100000
    val fMean = mean >= 3.0 && mean <= 10.0
    val fPunct = punctR <= 0.1
    val fAlpha = fracAlpha >= 0.8
    val fStops = ts.getField("hits") >= 2
    (mean, punctR, fracAlpha, fWords, fMean, fPunct, fAlpha, fStops)
  }

  /** The conjunctive Gopher keep decision as ONE Column — the form a
    * streaming admission stage filters on. Same expression tree as
    * [[gopherGate]]'s `keep`. */
  def gopherKeep(text: Column): Column = {
    val ts = graft.functions.TextStatsExpr(text, stopwords("en"))
    val (_, _, _, fWords, fMean, fPunct, fAlpha, fStops) =
      gopherFlags(ts, text)
    fWords && fMean && fPunct && fAlpha && fStops
  }

  def gopherGate(df: DataFrame, id: String, text: String): DataFrame = {
    val d = df.withColumn("__ts",
      graft.functions.TextStatsExpr(col(text), stopwords("en")))
    val (mean, punctR, fracAlpha, fWords, fMean, fPunct, fAlpha, fStops) =
      gopherFlags(col("__ts"), col(text))
    d.select(col(id),
        col("__ts.nTok").as("n_words"),
        round(mean, 6).as("mean_word_len"),
        round(punctR, 6).as("punct_ratio"),
        round(fracAlpha, 6).as("frac_alpha_words"),
        col("__ts.hits").as("n_stop_hits"),
        fWords.as("f_words"), fMean.as("f_meanlen"),
        fPunct.as("f_punct"), fAlpha.as("f_alpha"), fStops.as("f_stops"),
        (fWords && fMean && fPunct && fAlpha && fStops).as("keep"))
  }

  /** Exact-dup fingerprint (normalized FNV-1a, custom codegen'd expr;
    * normalization fused, == regexp_replace(lower(trim), "\\s+", " ")). */
  def withFingerprint(df: DataFrame, text: String): DataFrame =
    df.withColumn("fingerprint",
      graft.functions.Fnv1a64Expr(
        graft.functions.NormalizeTextExpr(col(text))))

  /** Bigram-interpolated LM scoring (the CCNet/Wikipedia-LM
    * perplexity filter): a bigram model trains on `train` and every
    * `score` document gets the average negative log of the
    * interpolated token probability
    * p = `lBi`·p_bi + (1−`lBi`)·p_uni, with
    * p_bi = c(prev,tok)/c(prev·) (0 when the context is unseen) and
    * p_uni add-1-smoothed over the training vocabulary, so p > 0 for
    * out-of-vocabulary tokens. Train and score MUST be disjoint in a
    * curation pipeline — score with a model trained elsewhere, never
    * on the documents being judged. Output: (id, n_bigrams,
    * avg_nll2), documents with < 2 tokens dropped (no bigram to
    * score).
    *
    * Scale: bigram extraction is per-row array arithmetic riding the
    * scan; model tables are bounded by CONTENT (vocab / bigram
    * types), joined by equi-key — AQE broadcasts them when they fit;
    * the two one-row totals broadcast explicitly. */
  def bigramInterpolatedNll(train: DataFrame, score: DataFrame,
      id: String, text: String, lBi: Double = 0.7,
      lUni: Double = 0.3): DataFrame = {
    // both weights are EXPLICIT literals (not 1−lBi: the float
    // subtraction would perturb the default to 0.30000000000000004
    // and quietly diverge from an oracle's written constant)
    def words(df: DataFrame) = df.select(col(id),
      filter(split(col(text), "\\s+"), x => length(x) > 0).as("__w"))
    def bigrams(df: DataFrame) = words(df)
      .filter(size(col("__w")) >= 2)
      .select(col(id), explode(transform(
        sequence(lit(2), size(col("__w"))),
        i => struct(element_at(col("__w"), i - 1).as("prev"),
          element_at(col("__w"), i).as("tok")))).as("__b"))
      .select(col(id), col("__b.prev").as("prev"), col("__b.tok").as("tok"))
    val uni = words(train)
      .select(explode(col("__w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val uniTot = uni.agg(sum("tf").as("total"), count(lit(1)).as("v"))
    val bi = bigrams(train).groupBy("prev", "tok")
      .agg(count(lit(1)).as("cb"))
    val ctx = bi.groupBy("prev").agg(sum("cb").as("cc"))
    val pBi = when(col("cc").isNull, lit(0.0))
      .otherwise(coalesce(col("cb"), lit(0L)).cast("double") /
        col("cc").cast("double"))
    val pUni = (coalesce(col("tf"), lit(0L)) + lit(1L)).cast("double") /
      (col("total") + col("v")).cast("double")
    bigrams(score)
      .join(bi, Seq("prev", "tok"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(uni, Seq("tok"), "left")
      .crossJoin(broadcast(uniTot)) // bounded: exactly one row
      .withColumn("__p", lit(lBi) * pBi + lit(lUni) * pUni)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("__p"))), 6).as("avg_nll2"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): each document is a
    * bag of HASHED n-grams — unigrams and bigrams FNV-folded into
    * `buckets` buckets — and two add-1-smoothed bag-of-buckets models
    * fit on the target-domain sample (p) and the raw pool (q). A
    * scored document's importance log-weight is
    * Σ_b n_b·(ln p_b − ln q_b): how much more target-like than
    * pool-like its feature mass is. Selection = rank by the weight
    * (production resampling adds per-doc Gumbel noise to the key —
    * hash-seeded when determinism matters; the ranking arithmetic is
    * unchanged).
    *
    * The per-bucket log-ratio quantizes to integer MICROS before the
    * per-document sum, so the sum is exact BIGINT arithmetic —
    * addition order (and engine) stop mattering, the ix2 BM25
    * technique. Output: (id, n_grams, logw_micros).
    *
    * Scale: featurization is a per-row explode riding the scan; both
    * models are groupBys bounded by `buckets` (a dial, not the
    * corpus) and broadcast to the scored side; one exact integer agg
    * per document ends it — no stage is ever corpus × corpus. */
  def dsirWeights(target: DataFrame, raw: DataFrame, score: DataFrame,
      id: String, text: String, buckets: Int = 4096): DataFrame = {
    def gramBuckets(df: DataFrame) = {
      val w = filter(split(col(text), "\\s+"), x => length(x) > 0)
      val bi = when(size(w) >= 2, transform(
        sequence(lit(2), size(w)),
        i => concat_ws(" ", element_at(w, i - 1), element_at(w, i))))
        .otherwise(typedLit(Seq.empty[String]))
      df.select(col(id), explode(concat(w, bi)).as("__g"))
        .select(col(id), pmod(graft.functions.Fnv1a64Expr(col("__g")),
          lit(buckets.toLong)).as("__b"))
    }
    def model(df: DataFrame, cnt: String) =
      gramBuckets(df).groupBy("__b").agg(count(lit(1)).as(cnt))
    val tm = model(target, "__tc")
    val rm = model(raw, "__rc")
    val totals = tm.agg(sum("__tc").as("__T"))
      .crossJoin(rm.agg(sum("__rc").as("__R"))) // 1 row × 1 row
    // ln of the same double bits reproduces across engines (the
    // tx7/tx10-proven kernel); quantize the per-BUCKET ratio once,
    // then only exact integer arithmetic touches per-document state
    val micros = floor(
      (log((coalesce(col("__tc"), lit(0L)) + lit(1L)).cast("double") /
        (col("__T") + lit(buckets.toLong)).cast("double")) -
       log((coalesce(col("__rc"), lit(0L)) + lit(1L)).cast("double") /
        (col("__R") + lit(buckets.toLong)).cast("double"))) *
      lit(1e6) + lit(0.5)).cast("long")
    gramBuckets(score).groupBy(col(id), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(tm), Seq("__b"), "left")
      .join(broadcast(rm), Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__mic", micros)
      .groupBy(col(id))
      .agg(sum("__n").as("n_grams"),
        sum(col("__n") * col("__mic")).as("logw_micros"))
  }

  /** Hash-seeded Gumbel noise for DSIR RESAMPLING (Xie et al. 2023
    * select by sampling ∝ exp(logw), not by argmax; the Gumbel-top-k
    * trick [Vieira 2014] turns that into "rank by logw + Gumbel(0,1)
    * noise" — one deterministic key, no sampling loop, no shuffle).
    * The noise is a pure function of (id, seed): u derives from the
    * FNV-1a hash of `"<id>:<seed>"` folded into 2²⁰ grid cells (never
    * 0 or 1 — both log poles excluded by construction), and
    * g = −ln(−ln u) quantizes to integer MICROS exactly like the
    * weight itself, so `logw_micros + gumbelMicros` stays exact
    * BIGINT arithmetic with no float-order ambiguity cross-engine.
    * Range by construction: g ∈ [−ln(ln(M+2)), ln((M+2)/2)] ≈
    * [−2.64, 13.17] for M = 2²⁰. Per-row compute riding the scan —
    * no state, no model, O(rows). */
  def gumbelMicros(idCol: Column, seed: Long): Column = {
    val m = 1L << 20
    val h = graft.functions.Fnv1a64Expr(
      concat(idCol.cast("string"), lit(":" + seed)))
    val u = (pmod(h, lit(m)) + lit(1L)).cast("double") /
      lit((m + 2).toDouble)
    floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long")
  }
}
