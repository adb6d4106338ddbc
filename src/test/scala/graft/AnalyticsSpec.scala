package graft

import graft.ops.Analytics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Damped average vs a scalar simulation, direction correlation,
  * scale-safe bucketing == ntile, normalize == window formulation. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("dampedAvg matches the reference's sequential recurrence") {
    val rnd = new scala.util.Random(5)
    val series = Seq.tabulate(250)(i => ("g", i.toLong, rnd.nextDouble() * 100))
    def sim(vs: Seq[Double]): (Double, Int) = {
      var nums = 0; var a = 0.0
      vs.foreach { v =>
        if (math.abs(v) >= 1e-7) {
          if (nums == 0) { nums = 1; a = v }
          else if (nums < 10) { a = (a * 9 + v) / 10; nums += 1 }
          else if (nums < 100) { a = (a * nums + v) / (nums + 1); nums += 1 }
          else a = (a * 99 + v) / 100
        }
      }
      (a, nums)
    }
    val (expA, expN) = sim(series.map(_._3))
    val out = Analytics.dampedAvg(series.toDF("g", "k", "v"),
        Seq("g"), col("k"), col("v"))
      .collect()(0)
    assert(math.abs(out.getAs[Double]("avgm") - expA) < 1e-9)
    assert(out.getAs[Int]("n_used") == expN)
  }

  test("dampedAvg skips zero samples like SIS_IS_ZERO") {
    val d = Seq(("g", 1L, 5.0), ("g", 2L, 0.0), ("g", 3L, 7.0))
      .toDF("g", "k", "v")
    val out = Analytics.dampedAvg(d, Seq("g"), col("k"), col("v")).collect()(0)
    assert(out.getAs[Int]("n_used") == 2)
    assert(math.abs(out.getAs[Double]("avgm") - (5.0 * 9 + 7.0) / 10) < 1e-12)
  }

  test("dampedRatio matches the reference's avgr recurrence") {
    val rnd = new scala.util.Random(17)
    val series = Seq.tabulate(150)(i =>
      ("g", i.toLong, rnd.nextDouble() * 10 + 1, rnd.nextDouble() * 5 + 1))
    def sim(vs: Seq[(Double, Double)]): (Double, Double, Int) = {
      var nums = 0; var avgm = 0.0; var avgr = 0.0
      vs.foreach { case (son, mom) =>
        if (!(math.abs(mom) < 1e-7 || (math.abs(son) < 1e-7 && nums < 10))) {
          val newv = son / mom
          if (nums == 0) { nums = 1; avgm = son; avgr = newv }
          else if (nums < 10) {
            val newm = avgm * 9 + son
            avgr = (avgm * 9) / newm * avgr + son / newm * newv
            avgm = newm / 10; nums += 1
          } else if (nums < 100) {
            val newm = avgm * nums + son
            avgr = (avgm * nums) / newm * avgr + son / newm * newv
            nums += 1; avgm = newm / nums
          } else {
            val newm = avgm * 99 + son
            avgr = (avgm * 99) / newm * avgr + son / newm * newv
            avgm = newm / 100
          }
        }
      }
      (avgm, avgr, nums)
    }
    val (em, er, en) = sim(series.map(t => (t._3, t._4)))
    val out = Analytics.dampedRatio(series.toDF("g", "k", "s", "m"),
      Seq("g"), col("k"), col("s"), col("m")).collect()(0)
    assert(math.abs(out.getAs[Double]("avgm") - em) < 1e-9)
    assert(math.abs(out.getAs[Double]("avgr") - er) < 1e-9)
    assert(out.getAs[Int]("n_used") == en)
  }

  test("dirCorr: all same direction = 1, alternating below half = negative") {
    val same = Seq((1.0, 2.0), (0.5, 0.1), (-1.0, -2.0), (-0.2, -0.1))
      .toDF("x", "y")
    val r1 = same.agg(Analytics.dirCorr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(r1 == 1.0)
    val opp = Seq((1.0, -2.0), (0.5, -0.1), (-1.0, 2.0), (-0.2, 0.1))
      .toDF("x", "y")
    val r2 = opp.agg(Analytics.dirCorr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(r2 == -3.0) // sames=0, diffs=4: (-1 - 0.5)*2 — reference formula
  }

  test("buckets (range-partitioned) == global ntile, all bucket sizes") {
    val rnd = new scala.util.Random(9)
    val df = Seq.tabulate(103)(i => (i.toLong, rnd.nextDouble())).toDF("id", "v")
    val fast = Analytics.buckets(df, 10, Seq(col("v").asc, col("id").asc), "b")
      .select("id", "b")
    val slow = df.withColumn("b",
        ntile(10).over(Window.orderBy(col("v").asc, col("id").asc)))
      .select("id", "b")
    val f = fast.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s = slow.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(f == s)
  }

  test("minMaxNorm (agg+join) == window formulation") {
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(60)(i => (i.toLong, s"g${i % 3}", rnd.nextDouble()))
      .toDF("id", "g", "v")
    val fast = Analytics.minMaxNorm(df, "v", Seq("g"), "n")
      .select("id", "n").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = Window.partitionBy("g")
    val slow = df.withColumn("n",
        (col("v") - min("v").over(w)) / (max("v").over(w) - min("v").over(w)))
      .select("id", "n").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    fast.foreach { case (id, v) => assert(math.abs(v - slow(id)) < 1e-12) }
  }

  test("minMaxNormSplit anchors mid at 0.5, squeezes each side") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("g", _)).toDF("g", "v")
    val out = Analytics.minMaxNormSplit(df, "v", lit(3.0), Seq("g"), "n")
      .select("v", "n").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(3.0) == 0.5)
    assert(out(1.0) == 0.001 && out(5.0) == 0.999)
    assert(out(2.0) > 0.001 && out(2.0) < 0.5)
    assert(out(4.0) > 0.5 && out(4.0) < 0.999)
  }

  test("lagCorr finds the planted lag") {
    // y is x shifted by 2: corr at offset 2 ~ 1
    val rnd = new scala.util.Random(21)
    val xs = Seq.fill(60)(rnd.nextDouble())
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (i, x, if (i >= 2) xs(i - 2) else rnd.nextDouble())
    }
    val out = Analytics.lagCorr(rows.toDF("d", "y", "x"), "x", "y", "d", 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(2) > 0.99)
    assert(math.abs(out(0)) < 0.5 && math.abs(out(1)) < 0.5)
  }
}
