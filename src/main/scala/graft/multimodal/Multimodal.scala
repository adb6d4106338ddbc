package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: media payloads are
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / frame-sample run as batched partition-local
  * operators so a 100 TB corpus streams through executors without any
  * driver involvement.
  *
  * The actual codec call is STUBBED: this container has no image/audio
  * libraries, so [[MediaDecoder.Fake]] derives deterministic pseudo
  * content from the payload bytes. Everything around it — the schema,
  * the batch shape (one decoder instance per partition, rows streamed),
  * partition preservation, the feature-vector column type — is the real
  * plumbing a JNI/FFmpeg/ImageIO decoder would plug into.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),       // image | audio | video | text
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** The pluggable codec boundary. A real deployment implements this
    * over ImageIO/FFmpeg; the engine only ever sees the trait. */
  trait MediaDecoder extends Serializable {
    def probe(payload: Array[Byte]): Row // → metaSchema row
    def features(payload: Array[Byte], dim: Int): Array[Float]
    def frameOffsets(payload: Array[Byte], everyMs: Long): Seq[Long]
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  object MediaDecoder {
    /** Deterministic fake: metadata and "features" derived from a
      * rolling hash of the payload — stable across runs/partitions, so
      * specs and oracles can assert on it. This is the stub. */
    object Fake extends MediaDecoder {
      private def h64(b: Array[Byte]): Long =
        graft.functions.Fnv1a64Expr.hash(b)
      def probe(payload: Array[Byte]): Row = {
        val h = h64(payload)
        Row("image", payload.length,
          (math.abs(h) % 1920 + 1).toInt,
          (math.abs(h >> 16) % 1080 + 1).toInt,
          math.abs(h >> 8) % 600000L)
      }
      def features(payload: Array[Byte], dim: Int): Array[Float] = {
        var h = h64(payload)
        Array.fill(dim) {
          h = h * 6364136223846793005L + 1442695040888963407L
          (h >>> 40).toFloat / (1L << 24).toFloat - 0.5f
        }
      }
      def frameOffsets(payload: Array[Byte], everyMs: Long): Seq[Long] = {
        val dur = math.abs(h64(payload) >> 8) % 600000L
        0L.to(dur, everyMs)
      }
      def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
        // fake "decode → scale → re-encode": a deterministic byte
        // stream of the target size, seeded by the source content
        var x = h64(payload) ^ (w.toLong << 32) ^ h.toLong
        Array.fill(math.max(16, w * h / 64)) {
          x = x * 6364136223846793005L + 1442695040888963407L
          (x >>> 56).toByte
        }
      }
    }
  }

  /** Attach decoded metadata to a payload column — batched
    * `mapPartitions`: one decoder per partition, rows streamed through
    * it (the Scala analogue of `mapInPandas` batch shape). */
  def withMeta(df: DataFrame, payloadCol: String,
      decoder: MediaDecoder = MediaDecoder.Fake,
      out: String = "media_meta"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(out, metaSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ (if (payload == null) null else decoder.probe(payload)))
      }
    }(enc)
  }

  /** Feature extraction: payload → `array<float>` embedding column,
    * ANN-ready ([[graft.ops.Similarity]] consumes it directly). */
  def withFeatures(df: DataFrame, payloadCol: String, dim: Int,
      decoder: MediaDecoder = MediaDecoder.Fake,
      out: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+
          (if (payload == null) null else decoder.features(payload, dim).toSeq))
      }
    }(enc)
  }

  /** Resize: payload → payload at the target resolution (real codec
    * behind [[MediaDecoder]]; batch shape identical to decode). */
  def resized(df: DataFrame, payloadCol: String, w: Int, h: Int,
      decoder: MediaDecoder = MediaDecoder.Fake,
      out: String = "payload_resized"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(out, BinaryType))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+
          (if (payload == null) null else decoder.resize(payload, w, h)))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame offset (video →
    * image rows) — the explode stays executor-side. */
  def sampleFrames(df: DataFrame, payloadCol: String, everyMs: Long,
      decoder: MediaDecoder = MediaDecoder.Fake,
      out: String = "frame_ms"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(out, LongType))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        if (payload == null) Iterator.empty
        else decoder.frameOffsets(payload, everyMs).iterator
          .map(off => Row.fromSeq(r.toSeq :+ off))
      }
    }(enc)
  }
}
