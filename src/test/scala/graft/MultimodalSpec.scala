package graft

import graft.multimodal.Multimodal
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batch shape, determinism, and that the
  * fake feature vectors flow straight into the ANN operators. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "alpha beta gamma"))
    .toDF("id", "text")
    .withColumn("payload", col("text").cast("binary"))

  test("withMeta attaches a typed metadata struct, deterministic per payload") {
    val out = Multimodal.withMeta(docs, "payload")
    assert(out.schema("media_meta").dataType == Multimodal.metaSchema)
    val rows = out.select("id", "media_meta.n_bytes", "media_meta.width")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // identical payloads (rows 1 and 3) → identical metadata
    assert(rows.find(_._1 == 1L).get._2 == rows.find(_._1 == 3L).get._2)
    assert(rows.find(_._1 == 1L).get._3 == rows.find(_._1 == 3L).get._3)
    assert(rows.forall(_._2 > 0))
  }

  test("withFeatures yields fixed-dim float vectors usable by ANN topK") {
    val emb = Multimodal.withFeatures(docs, "payload", dim = 8)
    assert(emb.schema("features").dataType.simpleString == "array<float>")
    val sizes = emb.select(size(col("features"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ == 8))
    // identical payloads are mutual nearest neighbors at cosine 1
    val nn = Similarity.bruteForceTopK(emb, emb.filter(col("id") === 1),
      "id", "features", 1)
    val top = nn.collect()(0)
    assert(top.getAs[Long]("neighbor_id") == 3L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("resized produces deterministic target-size payloads") {
    val out = Multimodal.resized(docs, "payload", 64, 64)
    assert(out.schema("payload_resized").dataType.typeName == "binary")
    val sizes = out.select("id", "payload_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    assert(sizes.forall(_._2.length == 64 * 64 / 64))
    // identical payloads resize identically
    assert(sizes.find(_._1 == 1L).get._2.toSeq ==
      sizes.find(_._1 == 3L).get._2.toSeq)
  }

  test("sampleFrames explodes deterministic frame offsets per payload") {
    val frames = Multimodal.sampleFrames(docs, "payload", everyMs = 60000)
    val counts = frames.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == counts(3L)) // same payload → same frame count
    assert(counts.values.forall(_ >= 1))
  }
}
