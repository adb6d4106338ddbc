package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation/join equal their unsalted formulations on skewed
  * data (one key carrying most rows). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key "HOT" has 90% of the rows
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "HOT" else s"k${i % 13}", i.toLong, i * 0.5)
  }.toDF("key", "seq", "v")

  test("saltedAgg == plain groupBy for sum/count") {
    val salted = Skew.saltedAgg(skewed, Seq("key"), salt = 8,
      partial = Seq("s" -> sum("v"), "n" -> count(lit(1))),
      merge = Seq("s" -> sum("s"), "n" -> sum("n")))
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
    val a = salted.collect().map(r => (r.getString(0),
      math.round(r.getDouble(1) * 1e6), r.getLong(2))).toSet
    val b = plain.collect().map(r => (r.getString(0),
      math.round(r.getDouble(1) * 1e6), r.getLong(2))).toSet
    assert(a == b)
  }

  test("saltedTopN == plain per-key window rank, hot key included") {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col("v").desc, col("seq").asc)
    val salted = Skew.saltedTopN(skewed, Seq("key"), order, n = 5, salt = 8)
      .select("key", "seq", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val plain = skewed
      .withColumn("rank", row_number().over(
        Window.partitionBy("key").orderBy(order: _*)))
      .filter(col("rank") <= 5)
      .select("key", "seq", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted == plain && salted.nonEmpty)
    // the hot key is capped to exactly n with exact ranks 1..n
    assert(salted.filter(_._1 == "HOT").map(_._3) == Set(1, 2, 3, 4, 5))
  }

  test("saltedTopN keeps keys with fewer than n rows intact") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("key", "seq")
    val out = Skew.saltedTopN(tiny, Seq("key"),
        Seq(col("seq").asc), n = 5, salt = 4)
      .select("key", "seq", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(("a", 1L, 1), ("a", 2L, 2), ("b", 3L, 1)))
  }

  test("saltedJoin == plain equi-join") {
    val dim = Seq(("HOT", "hot name"), ("k1", "one"), ("k2", "two"))
      .toDF("key", "name")
    val salted = Skew.saltedJoin(skewed, dim, Seq("key"), n = 8)
      .select("key", "seq", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val plain = skewed.join(dim, Seq("key"))
      .select("key", "seq", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain && salted.nonEmpty)
  }
}
