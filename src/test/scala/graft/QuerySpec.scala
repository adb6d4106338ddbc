package graft

import graft.ops.Query
import org.apache.spark.sql.DataFrame

/** The reference's own range/where contract fixture: 12 rows over 3
  * days with duplicate timestamps (workers/sisdb/sisdb_fmap_ctrl.c:683-719,
  * `_time_datas`), exercised through the io-layer semantics
  * (sisdb_fmap.h:101-137): start=-1 latest, stop=0 equality, stop=-1
  * open-ended, ifprev as-of fallback, count=±N, offset walk.
  */
class QuerySpec extends SparkSpec {
  import spark.implicits._

  // (time ms, seq) — same shape as the reference fixture: 3 rows day 1,
  // 4 rows day 2 (two at the same ms), 5 rows day 3 (3 + 2 dup ms)
  private val rows = Seq(
    (1630087372600L, 1), (1630087572600L, 2), (1630087672600L, 3),
    (1630187272600L, 4), (1630187372600L, 5), (1630187372600L, 6),
    (1630187572600L, 7),
    (1630287372600L, 8), (1630287372600L, 9), (1630287372600L, 10),
    (1630288372600L, 11), (1630288372600L, 12))

  private def df: DataFrame =
    rows.toDF("t", "newp").withColumn("subject",
      org.apache.spark.sql.functions.lit("k1"))

  private def newps(d: DataFrame): Seq[Int] =
    d.select("newp").collect().map(_.getInt(0)).toSeq.sorted

  test("range start=-1: latest record (last-inserted tie-break)") {
    val out = Query.lastRows(df, "subject", "t", tieBreak = Some("newp"))
    assert(newps(out) == Seq(12))
  }

  test("range stop=0: strict equality, multiple rows") {
    assert(newps(Query.range(df, "subject", "t", 1630187372600L, 0L)) ==
      Seq(5, 6))
  }

  test("range stop=-1: start to latest") {
    assert(newps(Query.range(df, "subject", "t", 1630287372600L, -1L)) ==
      Seq(8, 9, 10, 11, 12))
  }

  test("range [start, stop] inclusive both ends") {
    assert(newps(Query.range(df, "subject", "t",
      1630187272600L, 1630287372600L)) == Seq(4, 5, 6, 7, 8, 9, 10))
  }

  test("range equality miss without ifprev: empty") {
    assert(newps(Query.range(df, "subject", "t", 1630187472600L, 0L)).isEmpty)
  }

  test("range equality miss with ifprev: last record before start") {
    // rows strictly before start = newp 1..6 (newp 7 is AFTER start);
    // equal-time tie (5, 6) resolves to the last inserted, 6
    val out = Query.range(df, "subject", "t", 1630187472600L, 0L,
      ifprev = true, tieBreak = Seq("newp"))
    assert(newps(out) == Seq(6))
  }

  test("range hit with ifprev: fallback not used") {
    val out = Query.range(df, "subject", "t", 1630187372600L, 0L,
      ifprev = true, tieBreak = Seq("newp"))
    assert(newps(out) == Seq(5, 6))
  }

  test("where offset=-1: the record before the match") {
    assert(newps(Query.whereOffset(df, "subject", "t", 1630087572600L, -1,
      tieBreak = Seq("newp"))) == Seq(1))
  }

  test("where offset=+1: the record after the match") {
    assert(newps(Query.whereOffset(df, "subject", "t", 1630087572600L, 1,
      tieBreak = Seq("newp"))) == Seq(3))
  }

  test("where offset=0: the match itself") {
    assert(newps(Query.whereOffset(df, "subject", "t", 1630087572600L, 0,
      tieBreak = Seq("newp"))) == Seq(2))
  }

  test("count=-3: last three records in time+seq order") {
    assert(newps(Query.limitPerSubject(df, "subject", "t", -3,
      tieBreak = Seq("newp"))) == Seq(10, 11, 12))
  }

  test("count=+3: first three records") {
    assert(newps(Query.limitPerSubject(df, "subject", "t", 3,
      tieBreak = Seq("newp"))) == Seq(1, 2, 3))
  }

  test("fields projection") {
    assert(Query.fields(df, Seq("newp")).columns.toSeq == Seq("newp"))
  }

  // date-int series — the reference's second fixture (`_date_datas`,
  // sisdb_fmap_ctrl.c:688-701: 12 rows over 3 years, dup dates)
  private val dateRows = Seq(
    (20191010, 1), (20191110, 2), (20191210, 3),
    (20200110, 4), (20200210, 5), (20200310, 6), (20200310, 7),
    (20210315, 8), (20210320, 9), (20210320, 10),
    (20210410, 11), (20210410, 12))

  private def dateDf: DataFrame =
    dateRows.toDF("d", "newp").withColumn("subject",
      org.apache.spark.sql.functions.lit("k1"))

  private def newpsD(df2: DataFrame): Seq[Int] =
    df2.select("newp").collect().map(_.getInt(0)).toSeq.sorted

  test("date series: equality with dup dates, open range, ifprev") {
    val toL: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _.cast("long")
    assert(newpsD(Query.range(dateDf, "subject", "d", 20200310L, 0L,
      toLong = toL)) == Seq(6, 7))
    assert(newpsD(Query.range(dateDf, "subject", "d", 20210315L, -1L,
      toLong = toL)) == Seq(8, 9, 10, 11, 12))
    assert(newpsD(Query.range(dateDf, "subject", "d",
      20191110L, 20200210L, toLong = toL)) == Seq(2, 3, 4, 5))
    // miss between 0310 and 0315 → previous date's rows? No: last ROW
    // before start (the reference falls back to the nearest earlier
    // record, CMP_FIND_AGO)
    assert(newpsD(Query.range(dateDf, "subject", "d", 20200315L, 0L,
      ifprev = true, tieBreak = Seq("newp"), toLong = toL)) == Seq(7))
  }

  test("range + count cap: 'day1 0 5 day2' matrix entry") {
    // range rows 4..10; count=5 → first five; count=-2 → last two
    assert(newps(Query.rangeCount(df, "subject", "t",
      1630187272600L, 1630287372600L, 5, tieBreak = Seq("newp"))) ==
      Seq(4, 5, 6, 7, 8))
    assert(newps(Query.rangeCount(df, "subject", "t",
      1630187272600L, 1630287372600L, -2, tieBreak = Seq("newp"))) ==
      Seq(9, 10))
  }
}
