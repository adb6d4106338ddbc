package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query at the given SF and
  * prints one JSON line. Queries materialize through the `noop` sink —
  * a full computation of every output column (a bare `count()` lets
  * Catalyst prune unreferenced projections and under-measures
  * expression-heavy queries). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE rebuilds the full plan string on every adaptive update (for
      // the UI plan description) even with the UI off; literal-heavy
      // plans (inlined LSH planes/minhash coefs) make that real driver
      // CPU. Cap it — 100k leaves the in-query plan-assert strings (o4,
      // u1, j4: a few KB) untouched while bounding the MB-scale renders.
      .config("spark.sql.maxPlanStringLength", "100000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    // warm-up outside the timings: session init, parquet footers, first
    // codegen — otherwise the alphabetically-first query absorbs it all
    Tables(spark, sfDir, "region").write.format("noop").mode("overwrite").save()
    Tables(spark, sfDir, "lineitem").limit(1000)
      .write.format("noop").mode("overwrite").save()
    // a failed query records the sentinel -1, NOT its time-to-failure —
    // otherwise a regression that breaks a query reads as a speedup
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // the stdout tail the driver captures can truncate mid-JSON on a
    // large inventory — persist the full sorted vector as a file too
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_QUERIES.json"), line + "\n")
    // …and a SECOND, steady-state pass: the one-shot vector keeps
    // producing false regressions from first-run planning/catalog
    // state (t5/t6 in round 7, o2/st1 in round 3 — each re-adjudicated
    // by hand); a committed steady vector lets the per-round diff
    // separate plan changes from planning noise mechanically.
    // Skippable for quick local loops via SPARK_GRAFT_STEADY=0.
    if (sys.env.getOrElse("SPARK_GRAFT_STEADY", "1") != "0") {
      // the first pass leaks cached blocks by design (per-query engines
      // persist hot tails that die with their owners) — drop them, or
      // pass 2 measures GC pressure instead of steady-state plans
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      // only queries whose one-shot cost is large enough to ever be
      // flagged re-run: a sub-half-second query cannot regress by more
      // than noise, and skipping the tail keeps the driver's bench
      // wall bounded (it enters this vector the round it grows)
      val oneShot = results.toMap
      val steady = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => oneShot.getOrElse(name, 0.0) >= 0.5 }
        .map { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case _: Throwable => false }
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
      val sqs = steady.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val stotal = steady.map(_._2).filter(_ >= 0).sum
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_STEADY.json"),
        s"""{"metric":"steady_total","value":$stotal,"unit":"sec","queries":$sqs,"sf":"$sfDir"}""" + "\n")
    }
    spark.stop()
  }
}
