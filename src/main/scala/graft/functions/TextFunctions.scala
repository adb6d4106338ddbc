package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, shingling, quality signals, language-ID features,
  * fingerprints. All are native column expressions (codegen'd, no UDFs)
  * so they run at scan speed and distribute trivially.
  */
object TextFunctions {

  /** Whitespace tokens; empty strings removed. */
  def tokensWs(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword-ready tokens: runs of letters, runs of digits, or
    * single non-space symbols (a common pre-tokenizer split). Extraction
    * form (no lookarounds) so any RE2-class engine computes the same
    * token stream. */
  val BpePattern = "[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]"
  def tokensBpeish(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def tokenCountBpeish(text: Column): Column = size(tokensBpeish(text))

  def tokenCountWs(text: Column): Column = size(tokensWs(text))

  /** Word k-shingles (n-grams over the whitespace tokens), distinct. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokensWs(text)
    val n = size(toks)
    array_distinct(
      when(n < k, array(concat_ws(" ", toks)))
        .otherwise(
          transform(sequence(lit(0), n - k),
            i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** Character n-grams of the lowercased text (language-ID features). */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    val len = length(t)
    when(len < n, array(t)).otherwise(
      transform(sequence(lit(1), len - n + 1), i => substr(t, i, lit(n))))
  }

  /** Punctuation ratio: punctuation chars / total chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = total - length(regexp_replace(text, "\\p{Punct}", ""))
    when(total === 0, 0.0).otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Fraction of tokens that are in `stopwords` (lowercased compare). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokensWs(lower(text))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean token length (0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokensWs(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, real
    * word lengths, low punctuation density — the length/punct/stopword
    * heuristics a pretraining filter applies. Unrounded; callers that
    * need a cross-engine-stable rounding use [[roundHalfUp6]] (plain
    * `round` rounds exact .5 ulps differently across engines). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCountWs(text).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val wlen = meanTokenLen(text)
    val wlenScore = when(wlen.between(2.5, 9.0), 1.0).otherwise(0.3)
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val swScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    lenScore * 0.35 + wlenScore * 0.25 + punctScore * 0.2 + swScore * 0.2
  }

  /** Deterministic round-half-up at 6 decimals: floor(x*1e6 + 0.5)/1e6.
    * Unlike `round`, every engine computing the same double gets the
    * same answer (no HALF_UP vs HALF_EVEN divergence on exact halves). */
  def roundHalfUp6(c: Column): Column =
    floor(c * 1e6 + 0.5) / 1e6

  /** 64-bit FNV-1a over the code points of a string — a portable,
    * engine-independent hash (unlike Spark's murmur/xxhash, this is
    * trivially reproducible elsewhere, incl. in plain SQL).
    *
    * The h*prime step needs wrap-around (mod 2^64) semantics, which
    * ANSI mode (Spark 4 default) rejects as overflow — so the fold
    * carries (lo, hi) 32-bit lanes instead: with p = 2^40 + 0x1b3,
    * h*p ≡ lo*0x1b3 + (hi*0x1b3 + (lo & 0xffffff)·2^8)·2^32 (mod 2^64)
    * and every intermediate stays under 2^42. Identical output to the
    * canonical byte fold for ASCII input.
    */
  def fnv1a64(s: Column): Column = {
    val codes = transform(sequence(lit(1), length(s)),
      i => ascii(substr(s, i, lit(1))))
    // 0xcbf29ce484222325 split into 32-bit lanes
    val init = struct(lit(0x84222325L).as("lo"), lit(0xcbf29ce4L).as("hi"))
    val folded = aggregate(codes, init, (acc, b) => {
      val xlo = acc.getField("lo").bitwiseXOR(b.cast("long"))
      val a = xlo * lit(0x1b3L)
      val hiMul = acc.getField("hi") * lit(0x1b3L)
      val carry = shiftrightunsigned(a, 32)
      val shifted = shiftleft(xlo.bitwiseAND(lit(0xffffffL)), 8)
      struct(
        a.bitwiseAND(lit(0xffffffffL)).as("lo"),
        (hiMul + carry + shifted).bitwiseAND(lit(0xffffffffL)).as("hi"))
    })
    shiftleft(folded.getField("hi"), 32).bitwiseOR(folded.getField("lo"))
  }

  /** Document fingerprint: FNV-1a of the normalized text (lowercase,
    * collapsed whitespace) — exact-dup detection key. */
  def fingerprint(text: Column): Column =
    fnv1a64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** xxhash64-based per-token hashes (fast path when cross-engine
    * reproducibility is not required). */
  def tokenHashes(text: Column, seed: Int = 42): Column =
    transform(tokensWs(lower(text)), t => xxhash64(lit(seed), t))
}
