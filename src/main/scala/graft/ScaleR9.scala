package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 scaling harness (PLANS.md evidence): the LSH banding DIAL,
  * demonstrated end-to-end.
  *
  * PLANS.md's round-4 growth law says fixed banding cannot survive
  * corpus growth: unrelated pairs collide with a CONSTANT probability
  * set by the background similarity, so false candidates grow O(n²)
  * while the true near-dup set grows O(n). [[Dedup.bandingPlan]] is
  * the computed dial (rows-per-band up ~log G, bands re-widened for
  * recall). This harness runs both configs against a corpus whose
  * background similarity is realistic and constant in n — pages
  * sharing a site template, the web-crawl shape that makes
  * boilerplate the dominant cross-doc overlap — and measures:
  *
  *  - candidates-per-doc: fixed banding grows linearly in n
  *    (quadratic total); the solved plan grows far slower but sits
  *    ABOVE its falseCandidateBudget — deliberately kept in the
  *    output, because it demonstrates the model's limit: a
  *    corpus-GLOBAL shared set (the template, identical in every
  *    pair's intersection) makes some bands hot for every pair at
  *    once, a variance term the independent-pair S-curve cannot see
  *    (verified directly: with pair-private overlaps the measured
  *    band rate matches p^rows; with the template it is ~20× over);
  *  - the production remedy, measured: strip the template BEFORE
  *    shingling (the d8 boilerplate-span operator's job) — the
  *    "solved+stripped" rows land within the solver's budget;
  *  - recall on PLANTED near-dup pairs (content copied, tail edited,
  *    trigram Jaccard ≈ 0.85): every config must stay ≥ 0.9 — the
  *    solver cuts noise, not signal.
  *
  * The corpus is fully deterministic (hash-derived words, no RNG), so
  * runs reproduce bit-for-bit; the background similarity fed to the
  * solver is MEASURED from sampled pairs, the same way a production
  * planning job would estimate it, not hard-coded to match the
  * generator. */
object BandScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
      else Seq(1000, 2000, 4000, 8000)
    val spark = Harness.session()

    // ~12 template words + 40 content words per page → unrelated pages
    // share the template's trigrams only (measured jac ≈ 0.1)
    val boiler = (1 to 12).map(i => s"tmpl_$i").mkString(" ")
    def corpus(n: Int): DataFrame = {
      val base = spark.range(n.toLong).toDF("doc_id")
        .withColumn("__w", transform(sequence(lit(0), lit(39)),
          j => concat(lit("w"),
            pmod(xxhash64(col("doc_id"), j), lit(200000)))))
      val orig = base.select(col("doc_id"),
        concat_ws(" ", lit(boiler), concat_ws(" ", col("__w"))).as("text"))
      // planted near-dups: every 100th page gets a partner (id+n) with
      // the same content except the last 3 words — the whole-page
      // trigram Jaccard lands ≈ 0.85, above the 0.8 target
      val dup = base.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + lit(n.toLong)).as("doc_id"),
          concat_ws(" ", lit(boiler), concat_ws(" ",
            transform(col("__w"), (w, j) =>
              when(j >= 37, concat(lit("edit"), j)).otherwise(w)))).as("text"))
      orig.unionByName(dup)
    }

    sizes.foreach { n =>
      val docs = corpus(n).persist()
      val nDocs = docs.count()
      import spark.implicits._
      val planted = (0 until n by 100).map(i => (i.toLong, (i + n).toLong))
      val plantedDf = planted.toDF("id_a", "id_b")

      // production planning step: ESTIMATE background similarity from
      // sampled unrelated pairs (consecutive ids — never planted
      // partners, which are n apart). The sample is the DETERMINISTIC
      // id range < 501, not limit() — an unordered limit picks a
      // partitioning-dependent subset and the solved plan would not
      // reproduce across CPU counts.
      def measureBg(corpus: DataFrame): Double = {
        val sh = corpus.filter(col("doc_id") < 501)
          .select(col("doc_id"),
            graft.functions.ShingleHashesExpr(col("text"), 3).as("g"))
        sh.select(col("doc_id"), col("g"))
          .join(sh.select((col("doc_id") - 1).as("doc_id"), col("g").as("g2")),
            "doc_id")
          .select(avg(size(array_intersect(col("g"), col("g2"))).cast("double") /
            size(array_union(col("g"), col("g2")))).as("bg"))
          .head().getDouble(0)
      }
      val bg = measureBg(docs)

      def run(tag: String, bands: Int, sigLen: Int,
          on: DataFrame = docs): Unit = {
        val t0 = System.nanoTime()
        val sigs = Dedup.minhash(on, "text", shingleK = 3,
          numHashes = sigLen)
        val cands = Dedup.lshCandidates(sigs, "doc_id",
          bands = bands, sigLen = sigLen)
          .persist()
        val nCand = cands.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // recall via join, not collect — the fixed config's candidate
        // set is exactly the O(n²) blowup being measured
        val nFound = cands.join(broadcast(plantedDf), Seq("id_a", "id_b"))
          .count()
        val recall = nFound.toDouble / planted.size
        cands.unpersist()
        println(f"n=$nDocs%6d $tag%-22s cands=$nCand%9d " +
          f"per_doc=${nCand.toDouble / nDocs}%8.1f recall=$recall%.2f " +
          f"wall=$wall%.2f s")
      }

      run("fixed(16x2)", bands = 16, sigLen = 32)
      val plan = Dedup.bandingPlan(corpusSize = nDocs, targetSim = 0.8,
        backgroundSim = bg, minRecall = 0.9, falseCandidateBudget = 10.0)
      println(f"n=$nDocs%6d measured_bg=$bg%.3f solver: ${plan.bands}x" +
        f"${plan.rowsPerBand} (sig ${plan.sigLen}) predicted_recall=" +
        f"${plan.recallAtTarget}%.3f predicted_false_per_doc=" +
        f"${plan.expectedFalseCandidatesPerDoc}%.2f")
      run(s"solved(${plan.bands}x${plan.rowsPerBand})",
        bands = plan.bands, sigLen = plan.sigLen)
      // the production pre-step for template corpora: boilerplate off
      // BEFORE shingling (what d8's span detector feeds); background
      // similarity re-measured on the stripped text, floored at 0.02
      // (the solver needs a nonzero background; a planning job would
      // floor its estimate the same way)
      val stripped = docs.withColumn("text",
        regexp_replace(col("text"), lit("^" + boiler + " "), lit("")))
        .persist()
      stripped.count()
      val bg2 = measureBg(stripped).max(0.02)
      val plan2 = Dedup.bandingPlan(corpusSize = nDocs, targetSim = 0.8,
        backgroundSim = bg2, minRecall = 0.9, falseCandidateBudget = 10.0)
      println(f"n=$nDocs%6d stripped_bg=$bg2%.3f solver: ${plan2.bands}x" +
        f"${plan2.rowsPerBand} predicted_false_per_doc=" +
        f"${plan2.expectedFalseCandidatesPerDoc}%.2f")
      run(s"solved+stripped(${plan2.bands}x${plan2.rowsPerBand})",
        bands = plan2.bands, sigLen = plan2.sigLen, on = stripped)
      stripped.unpersist()
      docs.unpersist()
    }
    spark.stop()
  }
}
