package graft

import graft.ops.Write
import org.apache.spark.sql.functions._

/** M3/M4 write-algebra contracts (sisdb_fmap_write.c:256-305,374-385):
  * solely-upsert replaces the last match, equal-time appends keep
  * arrival order, upsert is idempotent. */
class WriteSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(String, String, Long, Double, Long)]) =
    rows.toDF("subject", "sole", "t", "v", "seq")

  test("M3 upsert: incoming replaces existing on (subject, sole, t)") {
    val existing = mk(Seq(("s1", "a", 1L, 10.0, 0L), ("s1", "b", 1L, 20.0, 1L)))
    val incoming = mk(Seq(("s1", "a", 1L, 11.0, 2L)))
    val out = Write.upsert(existing, incoming, "subject", Seq("sole"), "t", "seq")
      .orderBy("sole").collect()
    assert(out.map(r => (r.getString(1), r.getDouble(3))).toSeq ==
      Seq(("a", 11.0), ("b", 20.0)))
  }

  test("M3 upsert: highest ingest seq wins within incoming (backwards search)") {
    val existing = mk(Nil)
    val incoming = mk(Seq(
      ("s1", "a", 1L, 1.0, 10L), ("s1", "a", 1L, 2.0, 11L),
      ("s1", "a", 1L, 3.0, 12L)))
    val out = Write.upsert(existing, incoming, "subject", Seq("sole"), "t", "seq")
      .collect()
    assert(out.length == 1 && out(0).getDouble(3) == 3.0)
  }

  test("M3 upsert: idempotent (re-applying same batch changes nothing)") {
    val existing = mk(Seq(("s1", "a", 1L, 10.0, 0L)))
    val incoming = mk(Seq(("s1", "a", 1L, 11.0, 5L)))
    val once = Write.upsert(existing, incoming, "subject", Seq("sole"), "t", "seq")
    val twice = Write.upsert(once, incoming, "subject", Seq("sole"), "t", "seq")
    assert(once.orderBy("sole").collect().toSeq ==
      twice.orderBy("sole").collect().toSeq)
  }

  test("M4 append: equal timestamps keep arrival order (incoming after existing)") {
    val existing = mk(Seq(("s1", "x", 5L, 1.0, 0L)))
    val incoming = mk(Seq(("s1", "x", 5L, 2.0, 1L)))
    val out = Write.append(existing, incoming, "subject", "t")
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 2.0))
  }

  test("M5 delete range + M6 drop key") {
    val d = mk(Seq(("s1", "a", 1L, 1.0, 0L), ("s1", "a", 5L, 2.0, 1L),
      ("s2", "a", 9L, 3.0, 2L)))
    assert(Write.deleteRange(d, col("t"), 4L, 6L).count() == 2)
    assert(Write.dropKey(d, "subject", "s2").count() == 2)
  }

  test("M9 update-by-search rewrites only matching rows") {
    val d = mk(Seq(("s1", "a", 1L, 1.0, 0L), ("s1", "b", 2L, 2.0, 1L)))
    val out = Write.updateBySearch(d, col("sole") === "a",
        Map("v" -> lit(99.0)))
      .orderBy("sole").collect().map(_.getDouble(3)).toSeq
    assert(out == Seq(99.0, 2.0))
  }
}
