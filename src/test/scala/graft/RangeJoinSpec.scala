package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Bin-bucketed interval join vs the brute-force definition: every
  * `[lo, hi)` × point containment found exactly once, across negative
  * epochs, bin boundaries, empty/inverted intervals, and bin widths
  * that do and don't divide the interval endpoints. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Intervals deliberately straddle 0 (negative-epoch floor division),
  // sit exactly on bin boundaries, touch (hi == next lo), are empty
  // (hi == lo) and inverted (hi < lo — corrupt/sentinel data).
  private val intervals = Seq(
    (1L, -25L, 5L),   // straddles 0
    (2L, -30L, -10L), // fully negative, endpoints on multiples of 10
    (3L, 0L, 10L),    // [0, 10) — bin-aligned
    (4L, 10L, 11L),   // single-point-wide, lo on a boundary
    (5L, 7L, 7L),     // empty: matches nothing
    (6L, 1000L, 0L),  // inverted: matches nothing, must not explode
    (7L, -5L, 35L))   // spans several bins
    .toDF("iid", "lo", "hi")

  private val points = Seq(
    (100L, -30L), (101L, -25L), (102L, -11L), (103L, -10L), (104L, -1L),
    (105L, 0L), (106L, 5L), (107L, 7L), (108L, 9L), (109L, 10L),
    (110L, 11L), (111L, 30L), (112L, 34L), (113L, 35L))
    .toDF("pid", "pt")

  private def pairs(binWidth: Long): Set[(Long, Long)] =
    RangeJoin.binned(intervals, col("lo"), col("hi"),
        points, col("pt"), binWidth)
      .select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val expected: Set[(Long, Long)] = {
    val iv = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pts = points.collect().map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (iid, lo, hi) <- iv
      (pid, p) <- pts
      if p >= lo && p < hi
    } yield (iid, pid)).toSet
  }

  test("matches brute force exactly once, incl. negative epochs and boundaries") {
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.binned(intervals, col("lo"), col("hi"),
          points, col("pt"), w)
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length,
        s"binWidth=$w produced duplicate matches") // exactly-once: point lives in one bin
      assert(got.toSet == expected, s"binWidth=$w mismatch vs brute force")
    }
  }

  test("empty and inverted intervals are dropped before the explode") {
    // An inverted epoch-ms interval would explode to ~hi-lo rows with a
    // descending sequence(); post-fix the plan must stay tiny. Prove it
    // by joining with a bin width of 1 against a widely-inverted row —
    // pre-fix this materializes 100k+ rows, post-fix zero.
    val bad = Seq((1L, 1000000L, 0L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.binned(bad, col("lo"), col("hi"),
      points, col("pt"), 1L)
    assert(out.count() == 0)
    assert(pairs(10L).forall { case (iid, _) => iid != 5L && iid != 6L })
  }

  test("timestamp columns compare at millisecond precision") {
    // 0.5 s offsets: a cast("long") seconds truncation would collapse
    // lo/hi/pt onto the same second and produce a spurious match.
    val iv = Seq((1L, "2024-01-01 00:00:00.400", "2024-01-01 00:00:00.600"))
      .toDF("iid", "lo_s", "hi_s")
      .select(col("iid"), col("lo_s").cast("timestamp").as("lo"),
        col("hi_s").cast("timestamp").as("hi"))
    val pts = Seq((10L, "2024-01-01 00:00:00.500"),
        (11L, "2024-01-01 00:00:00.700"))
      .toDF("pid", "pt_s")
      .select(col("pid"), col("pt_s").cast("timestamp").as("pt"))
    val got = RangeJoin.binned(iv, col("lo"), col("hi"), pts, col("pt"), 100L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L)) // .7 s point is outside [.4, .6) — only at ms precision
  }

  test("overlap join matches brute force exactly once across bin widths") {
    val other = Seq( // (oid, olo, ohi) — overlaps, touches, contains, empty
      (200L, -27L, -24L), (201L, -10L, 0L), (202L, 0L, 1L), (203L, 4L, 12L),
      (204L, 10L, 10L), (205L, 30L, 20L), (206L, -100L, 100L), (207L, 35L, 40L))
      .toDF("oid", "olo", "ohi")
    val expectedOv: Set[(Long, Long)] = {
      val iv = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val ov = other.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      (for {
        (iid, lo, hi) <- iv; if lo < hi
        (oid, olo, ohi) <- ov; if olo < ohi
        if lo < ohi && olo < hi
      } yield (iid, oid)).toSet
    }
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.overlap(intervals, col("lo"), col("hi"),
          other, col("olo"), col("ohi"), w)
        .select("iid", "oid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length,
        s"binWidth=$w produced duplicate overlap pairs")
      assert(got.toSet == expectedOv, s"binWidth=$w mismatch vs brute force")
    }
  }

  test("binned and overlap match brute force on random inputs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      def span() = { // random interval around 0, sometimes inverted/empty
        val lo = rnd.nextInt(2001) - 1000L
        (lo, lo + rnd.nextInt(401) - 50L)
      }
      val iv = Seq.tabulate(25) { i => val (lo, hi) = span(); (i.toLong, lo, hi) }
      val ov = Seq.tabulate(25) { i => val (lo, hi) = span(); (100L + i, lo, hi) }
      val pts = Seq.tabulate(50)(i => (200L + i, rnd.nextInt(2401) - 1200L))
      val w = 1L + rnd.nextInt(300)

      val expBin = for {
        (a, lo, hi) <- iv; (p, t) <- pts; if t >= lo && t < hi
      } yield (a, p)
      val gotBin = RangeJoin.binned(iv.toDF("iid", "lo", "hi"), col("lo"), col("hi"),
          pts.toDF("pid", "pt"), col("pt"), w)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(gotBin.length == expBin.length && gotBin.toSet == expBin.toSet,
        s"binned trial $trial w=$w")

      val expOv = for {
        (a, lo, hi) <- iv; if lo < hi
        (b, olo, ohi) <- ov; if olo < ohi && lo < ohi && olo < hi
      } yield (a, b)
      val gotOv = RangeJoin.overlap(iv.toDF("iid", "lo", "hi"), col("lo"), col("hi"),
          ov.toDF("oid", "olo", "ohi"), col("olo"), col("ohi"), w)
        .select("iid", "oid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(gotOv.length == expOv.length && gotOv.toSet == expOv.toSet,
        s"overlap trial $trial w=$w")
    }
  }

  test("plan is an equi-join on the bin key, not BNLJ/cartesian") {
    val plan = RangeJoin.binned(intervals, col("lo"), col("hi"),
      points, col("pt"), 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
