package graft

import graft.ops.SeqPack
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: placements are a pure function
  * of the ordered prefix sum — exact budget fill, token conservation,
  * straddles split correctly, and the result is independent of the
  * input's physical partitioning. */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  // doc 1: 3 tok, doc 2: 10 tok (straddles), doc 3: 0 tok (dropped),
  // doc 4: 25 tok (spans three 8-token sequences), doc 5: 2 tok
  private val docs = Seq((1L, 3L), (2L, 10L), (3L, 0L), (4L, 25L),
    (5L, 2L)).toDF("doc_id", "tokens")

  private def collectPacked(df: org.apache.spark.sql.DataFrame) =
    SeqPack.pack(df, "tokens", 8L, Seq(col("doc_id")))
      .select("doc_id", "seq", "off", "doc_off", "len")
      .orderBy("doc_id", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("placements: straddles split at budget boundaries, zero-token docs dropped") {
    // stream: d1[0,3) d2[3,13) d4[13,38) d5[38,40); budget 8
    assert(collectPacked(docs) == Seq(
      (1L, 0L, 0L, 0L, 3L),
      (2L, 0L, 3L, 0L, 5L), (2L, 1L, 0L, 5L, 5L),
      (4L, 1L, 5L, 0L, 3L), (4L, 2L, 0L, 3L, 8L), (4L, 3L, 0L, 11L, 8L),
      (4L, 4L, 0L, 19L, 6L),
      (5L, 4L, 6L, 0L, 2L)))
  }

  test("every sequence but the last fills exactly; tokens conserve") {
    val packed = SeqPack.pack(docs, "tokens", 8L, Seq(col("doc_id")))
    val fills = SeqPack.fillStats(packed).orderBy("seq").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(fills == Seq((0L, 8L), (1L, 8L), (2L, 8L), (3L, 8L), (4L, 8L)))
    assert(packed.agg(sum("len")).head.getLong(0) == 40L)
    // per doc, spans partition [0, tokens)
    val perDoc = packed.groupBy("doc_id")
      .agg(sum("len").as("l"), min("doc_off").as("mn"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(perDoc(4L) == (25L, 0L) && perDoc(2L) == (10L, 0L))
  }

  test("result is independent of the input's physical partitioning") {
    val base = collectPacked(docs)
    assert(collectPacked(docs.repartition(7)) == base)
    assert(collectPacked(docs.repartition(1)) == base)
    assert(collectPacked(docs.orderBy(col("doc_id").desc)) == base)
  }

  test("duplicate order keys fail loudly instead of overlapping spans") {
    val dup = Seq((1L, 5L), (1L, 7L), (2L, 3L)).toDF("doc_id", "tokens")
    val ex = intercept[Exception] {
      SeqPack.pack(dup, "tokens", 8L, Seq(col("doc_id"))).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(ex).contains("duplicate order key"),
      s"expected the totality contract to raise, got: $ex")
  }

  test("duplicate NULL order keys also raise (null-safe guard)") {
    // with plain `===` the lag comparison is null for null-keyed rows
    // and the raise never fires — the `<=>` guard must catch them
    val dup = Seq((Some(1L), 5L), (None, 7L), (None, 3L))
      .toDF("doc_id", "tokens")
    val ex = intercept[Exception] {
      SeqPack.pack(dup, "tokens", 8L, Seq(col("doc_id"))).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(ex).contains("duplicate order key"),
      s"expected the null-keyed duplicate to raise, got: $ex")
  }

  test("sort-direction order columns (.desc) still pack; guard keys on values") {
    // a descending total order is a legitimate contract use — the
    // duplicate guard must strip the SortOrder wrapper, not crash
    val out = SeqPack.pack(docs, "tokens", 8L, Seq(col("doc_id").desc))
      .select("doc_id", "len").collect()
    assert(out.map(_.getLong(1)).sum == 40L, "tokens must conserve")
    // and the duplicate check still fires through the wrapper
    val dup = Seq((1L, 5L), (1L, 7L)).toDF("doc_id", "tokens")
    val ex = intercept[Exception] {
      SeqPack.pack(dup, "tokens", 8L, Seq(col("doc_id").desc)).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(ex).contains("duplicate order key"))
  }

  test("a single giant document chunks into ceil(n/budget) spans") {
    val one = Seq((42L, 100L)).toDF("doc_id", "tokens")
    val packed = collectPacked(one)
    assert(packed.size == 13 && packed.map(_._5).sum == 100L)
    assert(packed.init.forall(_._5 == 8L) && packed.last._5 == 4L)
    assert(packed.map(_._2) == (0L to 12L))
  }
}
