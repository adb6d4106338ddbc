package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE training: greedy merge semantics (runs, cascade safety), the
  * full loop against a hand-derived merge table, early exhaustion. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merge(arr: Seq[String], a: String, b: String): Seq[String] =
    Seq(arr).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), a, b))
      .collect()(0).getSeq[String](0)

  test("applyMerge: greedy left-to-right on same-symbol runs") {
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(merge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
  }

  test("applyMerge: a merge never cascades within its own round") {
    // (a,b) on "a a b": the second a merges with b; the result "ab"
    // must NOT then merge with the leading a (that would need a
    // (a,ab) rule from a LATER round)
    assert(merge(Seq("a", "a", "b"), "a", "b") == Seq("a", "ab"))
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
  }

  test("train: merge table matches a hand-run; exhaustion stops early") {
    // corpus: "abab abab cd" -> chars. Round 1: (a,b) x4 beats (b,a) x2
    // and (c,d) x1. Round 2 on merged symbols: (ab,ab) x2. Round 3:
    // (c,d) x1. Round 4: nothing left to merge -> early stop.
    val docs = Seq("abab abab cd").toDF("text")
    val (merges, rest) = Bpe.train(docs, "text", rounds = 6)
    assert(merges.map(m => (m.round, m.left, m.right, m.n)) == Seq(
      (1, "a", "b", 4L), (2, "ab", "ab", 2L), (3, "c", "d", 1L)))
    val finalSyms = rest.select("syms").collect()
      .map(_.getSeq[String](0)).sortBy(_.mkString)
    assert(finalSyms.toSeq == Seq(Seq("abab"), Seq("abab"), Seq("cd")))
  }

  test("encode: applying the trained merges reproduces train's final state") {
    val docs = Seq((1L, "abab abab cd"), (2L, "ab cdcd")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, "text", rounds = 3)
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "n_sym0", "n_sym").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // merges (derived): (a,b) n=5, then (c,d) n=3, then (ab,ab) n=2
    // doc 1: abab->1 sym, abab->1, cd->1; doc 2: ab->1, cdcd->cd,cd->2
    assert(got(0) == ((1L, 10L, 3L)), s"doc1 ${got(0)}")
    assert(got(1) == ((2L, 6L, 3L)), s"doc2 ${got(1)}")
  }
}
