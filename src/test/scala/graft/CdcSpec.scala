package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

/** Keyed row-level diff: op classification, unchanged-row dropping,
  * null-safe payload comparison, and the schema guard. The engine
  * surface (changesBetween over pinned generations) is exercised
  * end-to-end by the e18 oracle query. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "etype", "v")

  test("insert/delete/update classified; unchanged rows dropped") {
    val newDf = Seq(
      (1L, "a", 10.0),  // unchanged
      (2L, "b", 25.0),  // update (value)
      (3L, "X", 30.0),  // update (other payload field)
      (5L, "e", 50.0))  // insert; 4 deleted
      .toDF("k", "etype", "v")
    val out = Cdc.diff(oldDf, newDf, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"))
  }

  test("null keys match null-safely: an update is never a delete+insert pair") {
    val o = Seq((Option.empty[java.lang.Long], "a", 1.0),
      (Some(java.lang.Long.valueOf(1L)), "b", 2.0))
      .map { case (k, e, v) => (k.map(Long2long).getOrElse(-1L), e, v) }
      .toDF("k", "etype", "v")
      .withColumn("k", when(col("k") === -1L, lit(null)).otherwise(col("k")))
    val n = o.withColumn("v",
      when(col("k").isNull, lit(9.0)).otherwise(col("v")))
    val out = Cdc.diff(o, n, Seq("k")).collect()
    assert(out.length == 1 && out.head.getString(1) == "update" &&
      out.head.isNullAt(0),
      s"null-keyed update misclassified: ${out.toSeq}")
    // unchanged null-keyed rows are dropped like any other
    assert(Cdc.diff(o, o, Seq("k")).isEmpty)
  }

  test("old/new payload structs carried, null on the absent side") {
    val newDf = Seq((2L, "b", 25.0), (5L, "e", 50.0)).toDF("k", "etype", "v")
    val rows = Cdc.diff(oldDf.filter(col("k").isin(2L, 4L)), newDf, Seq("k"))
      .orderBy("k").collect()
    val byK = rows.map(r => r.getLong(0) ->
      (r.getString(1), Option(r.getStruct(2)), Option(r.getStruct(3)))).toMap
    assert(byK(2L)._1 == "update" &&
      byK(2L)._2.get.getDouble(1) == 20.0 &&
      byK(2L)._3.get.getDouble(1) == 25.0)
    assert(byK(4L) == (("delete", byK(4L)._2, None)) && byK(4L)._2.isDefined)
    assert(byK(5L)._1 == "insert" && byK(5L)._2.isEmpty)
  }

  test("null-to-value payload transitions are updates, not unchanged") {
    val o = Seq((1L, Some(1.0)), (2L, Option.empty[Double]))
      .toDF("k", "v")
    val n = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("k", "v")
    val out = Cdc.diff(o, n, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // k=1: value -> null is an UPDATE (null-safe struct compare);
    // k=2: null == null is unchanged and must drop
    assert(out == Map(1L -> "update"))
  }

  test("mismatched payload schemas are refused") {
    val n = Seq((1L, "a")).toDF("k", "etype")
    val ex = intercept[IllegalArgumentException] {
      Cdc.diff(oldDf, n, Seq("k"))
    }
    assert(ex.getMessage.contains("align"))
  }

  test("duplicate keys raise in-plan instead of fanning out spurious rows") {
    val dupNew = Seq((2L, "b", 25.0), (2L, "b2", 26.0), (5L, "e", 50.0))
      .toDF("k", "etype", "v")
    val ex = intercept[Exception] {
      Cdc.diff(oldDf, dupNew, Seq("k")).collect()
    }
    assert(ex.getMessage.contains("duplicate key"),
      s"expected the in-plan duplicate-key raise, got: ${ex.getMessage}")
    // opting out (uniqueness guaranteed upstream) skips the guard —
    // the fan-out is then the caller's documented responsibility
    assert(Cdc.diff(oldDf, dupNew, Seq("k"), assertUniqueKeys = false)
      .count() >= 3)
  }

  test("the guard is total: partially- and fully-identical duplicates raise too") {
    // old = (k,p), new = (k,p)+(k,p2): the joined pairs are one
    // unchanged row and one update — a changed-rows-only guard passed
    // this, yet the emitted 'update' feed cannot reproduce a new
    // state that holds BOTH rows
    val o = Seq((2L, "b", 20.0)).toDF("k", "etype", "v")
    val partial = Seq((2L, "b", 20.0), (2L, "b", 21.0))
      .toDF("k", "etype", "v")
    val ex = intercept[Exception] {
      Cdc.diff(o, partial, Seq("k")).collect()
    }
    assert(ex.getMessage.contains("duplicate key"),
      s"partially-identical duplicate escaped the guard: ${ex.getMessage}")
    // fully-identical duplicates raise as well — the feed cannot
    // represent row multiplicity, so 'empty feed' would still not
    // reproduce the new state's two rows from the old state's one
    val full = Seq((2L, "b", 20.0), (2L, "b", 20.0)).toDF("k", "etype", "v")
    val ex2 = intercept[Exception] {
      Cdc.diff(o, full, Seq("k")).collect()
    }
    assert(ex2.getMessage.contains("duplicate key"))
    // the side is named so the caller knows where to look
    assert(ex.getMessage.contains("new side"), ex.getMessage)
  }

  test("feed applied to the old state reproduces the new state") {
    val newDf = Seq((2L, "b", 25.0), (3L, "c", 30.0), (5L, "e", 50.0))
      .toDF("k", "etype", "v")
    val feed = Cdc.diff(oldDf, newDf, Seq("k"))
    // apply: delete dropped keys, upsert inserted/updated payloads
    val deletes = feed.filter(col("op") === "delete").select("k")
    val upserts = feed.filter(col("op") =!= "delete")
      .select(col("k"), col("new.etype").as("etype"), col("new.v").as("v"))
    val applied = oldDf.join(deletes, Seq("k"), "left_anti")
      .join(upserts.select("k"), Seq("k"), "left_anti")
      .unionByName(upserts)
    assert(applied.orderBy("k").collect().toSeq ==
      newDf.orderBy("k").collect().toSeq)
  }
}
