package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction /
  * resize / frame-sampling run as batched per-partition transforms.
  *
  * The actual codec calls are STUBBED (this container ships no image/audio
  * libraries): [[StubCodec]] derives a deterministic fake feature vector /
  * thumbnail from the bytes. Everything around the stub — schema, batch
  * iteration, partitioning, output shapes — is real, so swapping in a JNI
  * or Python-worker codec (mapInPandas-style batching) changes one object.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)
    )))
  ))

  /** Deterministic stand-in for a real decoder: features are a seeded hash
    * expansion of the payload; "resize" rescales the fake thumbnail grid;
    * "frame sample" slices the payload into n pseudo-frames.
    */
  object StubCodec {
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null) return Array.fill(dim)(0f)
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      i = 0
      while (i < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = (h.toDouble / Long.MaxValue).toFloat
        i += 1
      }
      out
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      var i = 0
      while (i < out.length) {
        out(i) = if (bytes == null || bytes.isEmpty) 0 else bytes(i % bytes.length)
        i += 1
      }
      out
    }

    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) return Seq.fill(n)(Array.empty[Byte])
      val step = math.max(1, bytes.length / n)
      (0 until n).map(i => bytes.slice(i * step, math.min(bytes.length, i * step + step)))
    }
  }

  /** media frame -> embedding column via batched per-partition decode.
    * Batches amortize (future) codec-worker startup exactly like
    * mapInPandas' Arrow batches would.
    */
  def decodeToEmbedding(df: DataFrame, dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val mediaIdx = df.schema.fieldIndex("media")
    val outSchema = df.schema.add(StructField("embedding", ArrayType(FloatType)))
    // Dataset.mapPartitions (not df.rdd + createDataFrame): the decode stays
    // a single logical plan node, so caching/AQE/reuse still see one plan
    // instead of an opaque RDD scan stitched onto a fresh root
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // (a real codec would decode the whole batch in one worker call)
        batch.map { r =>
          val emb = StubCodec.decodeFeatures(r.getAs[Array[Byte]](mediaIdx), dim)
          Row.fromSeq(r.toSeq :+ emb.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Thumbnail + n-frame sample in one batched pass. */
  def extract(df: DataFrame, thumbW: Int = 8, thumbH: Int = 8, nFrames: Int = 4,
              batchSize: Int = 256): DataFrame = {
    val mediaIdx = df.schema.fieldIndex("media")
    val outSchema = df.schema
      .add(StructField("thumbnail", BinaryType))
      .add(StructField("frames", ArrayType(BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val b = r.getAs[Array[Byte]](mediaIdx)
          Row.fromSeq(r.toSeq :+ StubCodec.resize(b, thumbW, thumbH) :+ StubCodec.sampleFrames(b, nFrames))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
