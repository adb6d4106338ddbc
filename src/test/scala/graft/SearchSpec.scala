package graft

import graft.ops.Search
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval: the integer-micro score matches a driver-side
  * hand computation of the textbook formula, ranking behaves (more
  * matched terms / rarer terms score higher), and the postings layout
  * carries the doc length so probes never touch a doc-side table. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple cherry"),        // tf(apple)=2, dl=4
    (2L, "apple banana banana banana fig"),   // dl=5
    (3L, "cherry fig grape kiwi lemon mango"),// dl=6
    (4L, "apple apple apple apple")           // dl=4, apple-heavy
  ).toDF("doc_id", "text")

  test("postings denormalize dl; stats match hand counts") {
    val post = Search.postings(corpus, "doc_id", "text")
    val rows = post.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.contains(("apple", 1L, 2L, 4L)))
    assert(rows.contains(("banana", 2L, 3L, 5L)))
    assert(rows.contains(("mango", 3L, 1L, 6L)))
    val st = Search.corpusStats(post, "doc_id").collect()(0)
    assert(st.getDouble(0) == 4.0)
    assert(math.abs(st.getDouble(1) - 19.0 / 4.0) < 1e-12)
  }

  test("bm25 micros equal the textbook formula computed on the driver") {
    def bm25(tf: Double, df: Double, dl: Double, n: Double, avgdl: Double): Long = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val s = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      math.floor(s * 1e6 + 0.5).toLong
    }
    val post = Search.postings(corpus, "doc_id", "text")
    val stats = Search.corpusStats(post, "doc_id")
    val pruned = post.filter(col("term").isin("apple", "cherry"))
    val got = Search.bm25Rank(pruned, "doc_id", stats, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = 4.0; val avgdl = 19.0 / 4.0
    // df(apple)=3, df(cherry)=2 over the pruned postings
    val exp = Map(
      1L -> (2L, bm25(2, 3, 4, n, avgdl) + bm25(1, 2, 4, n, avgdl)),
      2L -> (1L, bm25(1, 3, 5, n, avgdl)),
      3L -> (1L, bm25(1, 2, 6, n, avgdl)),
      4L -> (1L, bm25(4, 3, 4, n, avgdl)))
    assert(got == exp, s"got $got expected $exp")
  }

  test("ranking: matching both terms beats one; rarer term outscores common") {
    val post = Search.postings(corpus, "doc_id", "text")
    val stats = Search.corpusStats(post, "doc_id")
    val ranked = Search.bm25Rank(
      post.filter(col("term").isin("apple", "cherry")),
      "doc_id", stats, k = 10).collect()
    assert(ranked.head.getLong(0) == 1L,
      "doc 1 (both terms) must rank first")
    // cherry (df=2) in doc 3 must outscore a single apple (df=3) in
    // doc 2 despite doc 3 being LONGER — idf monotonicity dominates
    val scores = ranked.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(3L) > scores(2L),
      s"rarer-term doc should outrank: ${scores(3L)} vs ${scores(2L)}")
  }

  test("rrfFuse: exact integer contributions, overlap sums, nulls for absent") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = Search.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
      .toMap
    def c(r: Int) = 1000000000000L / (60L + r) // exact integer quotient
    assert(out(10L) == ((1L, Some(1), None, c(1))))
    assert(out(20L) == ((2L, Some(2), Some(1), c(2) + c(1))),
      "overlapping doc must sum both lists' contributions")
    assert(out(30L) == ((1L, Some(3), None, c(3))))
    assert(out(40L) == ((1L, None, Some(2), c(2))))
    // fused order: the doc both retrievers agree on wins
    val top = Search.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id")
      .orderBy(col("rrf_1e12").desc, col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(top.head == 20L)
  }
}
