package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling harness for [[Dedup.connectedComponents]] (the d7 operator):
  * build the real dup graph once from the documents corpus (minhash →
  * LSH candidates → est-Jaccard ≥ 0.5 pairs, exactly d7's pipeline),
  * then replicate vertices+edges G× with disjoint id offsets — the
  * graph-level analogue of the d5b sign-flip replicas: per-replica
  * structure identical, total volume scaled — and measure rounds-to-
  * converge, per-round changed counts, and wall time vs |V|/|E|.
  * Results recorded in PLANS.md (round-7 audit).
  *
  * usage: runMain graft.CcScale [sfDir] [replicas,...]
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 2, 5, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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

    val d0 = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val sig = Dedup.minhash(d0, "text", shingleK = 3, numHashes = 32)
    val basePairs = Dedup.minhashJaccard(
        Dedup.lshCandidates(sig, "doc_id", bands = 16, sigLen = 32),
        sig, "doc_id")
      .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b").persist()
    val e0 = basePairs.count()
    val v0 = d0.count()
    println(s"base graph: V=$v0 E=$e0")

    val off = 100000000L
    reps.foreach { g =>
      val verts = (0 until g).map(i => d0.select(
          (col("doc_id") + lit(i * off)).as("doc_id")))
        .reduce(_ unionByName _).persist()
      val edges = (0 until g).map(i => basePairs.select(
          (col("id_a") + lit(i * off)).as("id_a"),
          (col("id_b") + lit(i * off)).as("id_b")))
        .reduce(_ unionByName _).persist()
      val (v, e) = (verts.count(), edges.count())
      var rounds = 0
      val changes = scala.collection.mutable.ArrayBuffer[Long]()
      val t0 = System.nanoTime()
      val cc = Dedup.connectedComponents(verts, "doc_id", edges,
        onRound = (i, ch) => { rounds = i; changes += ch })
      val nClusters = cc.select("cluster_id").distinct().count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"g=$g%2d V=$v%8d E=$e%8d rounds=$rounds " +
        f"changes=${changes.mkString(",")} clusters=$nClusters wall=$wall%.2f s " +
        f"(${wall / rounds}%.2f s/round)")
      spark.sharedState.cacheManager.clearCache()
      basePairs.persist(); basePairs.count()
    }
    spark.stop()
  }
}
