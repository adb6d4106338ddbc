package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics: inclusive vs strict, per-key isolation,
  * missing-right-side nulls (sisdb_fmap.h:109-137, CMP_FIND_AGO). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq( // (key, time, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0))
    .toDF("k", "qt", "px")
  private val probes = Seq( // (key, time, probe id)
    ("A", 5L, 1), ("A", 20L, 2), ("A", 25L, 3), ("A", 99L, 4),
    ("B", 14L, 5), ("C", 50L, 6))
    .toDF("k", "pt", "pid")

  private def run(strict: Boolean): Map[Int, Option[Double]] =
    AsOf.join(probes, quotes.select(col("k"), col("qt"), col("px")),
        Seq("k"), "pt", "qt", Seq("px"), strict = strict)
      .select("pid", "px").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("inclusive: latest quote at or before each probe, per key") {
    val out = run(strict = false)
    assert(out(1).isEmpty)            // before any quote
    assert(out(2).contains(2.0))      // equal time included
    assert(out(3).contains(2.0))
    assert(out(4).contains(3.0))      // after last quote
    assert(out(5).isEmpty)            // B's quote is later
    assert(out(6).isEmpty)            // key with no quotes at all
  }

  test("strict: equal-time quote excluded") {
    val out = run(strict = true)
    assert(out(2).contains(1.0))      // 20L quote no longer admissible
    assert(out(3).contains(2.0))
  }
}
