package graft

import graft.ops.Pipeline
import org.apache.spark.sql.functions._

/** Training-data pipeline stages: determinism, stability under corpus
  * growth, and the packing/chunking invariants. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, s"doc number $i with a few tokens " * (i % 7 + 1)))
      .toDF("id", "text")

  test("hashSplit covers every row exactly once, roughly by weight") {
    val split = Pipeline.hashSplit(corpus(2000), $"id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val counts = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1600 && counts("train") < 1950)
    assert(counts("val") > 30 && counts("test") > 30)
  }

  test("hashSplit is stable as the corpus grows") {
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val small = Pipeline.hashSplit(corpus(500), $"id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val big = Pipeline.hashSplit(corpus(2000), $"id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    // every originally-assigned row keeps its split after 4x growth
    assert(small.forall { case (id, s) => big(id) == s })
  }

  test("balanceGroups flattens skewed groups to ~the smallest share") {
    // 3 sources with 10:3:1 skew
    val df = corpus(2600).withColumn("src",
      when($"id" <= 2000, "big").when($"id" <= 2400, "mid").otherwise("small"))
    val kept = Pipeline.balanceGroups(df, $"src", $"id")
    val counts = kept.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(counts("small") == 200) // rate 1.0: the floor group keeps everything
    // hash sampling is approximate: each flattened group within ±40%
    assert(counts("big") > 120 && counts("big") < 280, counts.toString)
    assert(counts("mid") > 120 && counts("mid") < 280, counts.toString)
    // deterministic: same selection on re-run
    val again = Pipeline.balanceGroups(df, $"src", $"id")
      .select("id").as[Long].collect().sorted
    assert(again.sameElements(kept.select("id").as[Long].collect().sorted))
    // collision guard
    intercept[IllegalArgumentException] {
      Pipeline.balanceGroups(df.withColumn("__cnt", lit(1)), $"src", $"id")
    }
  }

  test("temperatureSample flattens toward (not onto) the smallest share") {
    val df = corpus(2600).withColumn("src",
      when($"id" <= 2000, "big").when($"id" <= 2400, "mid").otherwise("small"))
    val kept = Pipeline.temperatureSample(df, $"src", $"id")
    val counts = kept.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(counts("small") == 200) // rate 1.0 for the floor group
    // big: rate sqrt(200/2000)=0.316 → ~632 expected; mid: sqrt(0.5)=0.707 → ~283
    assert(counts("big") > 450 && counts("big") < 820, counts.toString)
    assert(counts("mid") > 200 && counts("mid") < 360, counts.toString)
    // strictly between full balancing and keeping everything
    val balanced = Pipeline.balanceGroups(df, $"src", $"id")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("big") > balanced("big") && counts("big") < 2000)
  }

  test("stratifiedSample keeps roughly the per-stratum rate") {
    val df = corpus(3000).withColumn("lang",
      when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "zh").otherwise("de"))
    val kept = Pipeline.stratifiedSample(df, $"lang", $"id",
      rates = Map("en" -> 0.9, "zh" -> 0.1), default = 0.5)
    val counts = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(counts("en") > 800 && counts("en") <= 1000)
    assert(counts("zh") < 200)
    assert(counts("de") > 350 && counts("de") < 650)
    // deterministic: a second run selects the identical id set
    val again = Pipeline.stratifiedSample(df, $"lang", $"id",
      rates = Map("en" -> 0.9, "zh" -> 0.1), default = 0.5)
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
  }

  test("globalShuffle: pos is a 1..n permutation, order follows the hash") {
    val shuf = Pipeline.globalShuffle(corpus(1000), $"id", salt = "e0")
    val rows = shuf.select($"__shuf", $"pos").as[(Long, Long)]
      .collect().sortBy(_._2)
    assert(rows.map(_._2).toSeq == (1L to 1000L))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // a different salt yields a genuinely different order
    val other = Pipeline.globalShuffle(corpus(1000), $"id", salt = "e1")
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    val base = shuf.select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(base.count { case (id, p) => other(id) == p } < 50)
  }

  test("packChunks: windows are exactly ctx tokens and partition the stream") {
    val ctx = 64
    val packed = Pipeline.packChunks(
      corpus(300), $"id", graft.functions.TextFunctions.tokenCountWs($"text"), ctx)
      .select($"id", $"n_tok", $"tok_offset", $"chunk_id", $"n_in_chunk")
      .as[(Long, Long, Long, Long, Long)].collect()
    val totalTok = packed.groupBy(_._1).map(_._2.head._2).sum
    // every document's tokens are fully assigned across its windows
    packed.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._5).sum == rows.head._2)
    }
    // every window except the last carries exactly ctx tokens
    val perChunk = packed.groupBy(_._4).view.mapValues(_.map(_._5).sum)
    val lastChunk = perChunk.keys.max
    perChunk.foreach { case (c, n) =>
      if (c < lastChunk) assert(n == ctx, s"chunk $c carried $n")
      else assert(n <= ctx)
    }
    assert(perChunk.values.sum == totalTok)
  }

  test("pipeline stages refuse input columns their outputs would shadow") {
    intercept[IllegalArgumentException] {
      Pipeline.hashSplit(corpus(10).withColumn("bucket", lit(1)),
        $"id", Seq("a" -> 50, "b" -> 50))
    }
    intercept[IllegalArgumentException] {
      Pipeline.stratifiedSample(corpus(10).withColumn("__stratum", lit("x")),
        $"text", $"id", rates = Map("x" -> 0.5), default = 0.5)
    }
    intercept[IllegalArgumentException] {
      Pipeline.packChunks(corpus(10).withColumn("tok_offset", lit(0L)),
        $"id", lit(1L), ctx = 64)
    }
    intercept[IllegalArgumentException] {
      Pipeline.globalShuffle(corpus(10).withColumn("pos", lit(0L)), $"id", "e0")
    }
  }

  test("packChunks tiebreak gives duplicate order keys a total order") {
    val df = corpus(200).withColumn("grp", $"id" % 10)
    val packed = Pipeline.packChunks(df, $"grp",
        graft.functions.TextFunctions.tokenCountWs($"text"), ctx = 64,
        tiebreak = Seq($"id"))
      .select($"id", $"grp", $"n_tok", $"tok_offset")
      .as[(Long, Long, Long, Long)].collect().distinct
    // tok_offset must be the exclusive running sum of n_tok in exact
    // (grp, id) order — only true when the window honors the tiebreak
    var cum = 0L
    packed.sortBy(r => (r._2, r._1)).foreach { case (_, _, nTok, off) =>
      assert(off == cum, s"offset $off != running sum $cum")
      cum += nTok
    }
  }

  test("chunkSliding covers the text with the declared overlap") {
    val df = Seq((1L, "a" * 500), (2L, "b" * 200), (3L, "c" * 10), (4L, "d" * 201))
      .toDF("id", "text")
    val chunks = Pipeline.chunkSliding(df, $"text", size = 200, stride = 150)
      .select($"id", $"chunk_idx", $"chunk_text").as[(Long, Long, String)]
      .collect().groupBy(_._1)
    // 500 chars -> starts 0,150,300 (300+200=500 reaches the end)
    assert(chunks(1L).length == 3)
    assert(chunks(1L).map(_._3.length).toSet == Set(200))
    // exactly size chars -> single window
    assert(chunks(2L).length == 1 && chunks(2L).head._3.length == 200)
    // shorter than size -> single short window
    assert(chunks(3L).length == 1 && chunks(3L).head._3.length == 10)
    // one char past size -> second (short, trailing) window appears
    assert(chunks(4L).length == 2)
    // reconstruction: stitching chunk[i][overlap..] onto chunk0 rebuilds the text
    val text1 = chunks(1L).sortBy(_._2).map(_._3)
    val rebuilt = text1.head + text1.tail.map(_.substring(50)).mkString
    assert(rebuilt == "a" * 500)
  }
}
