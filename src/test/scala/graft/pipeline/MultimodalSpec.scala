package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val media = {
    val rng = new scala.util.Random(3)
    val rows = (0L until 50L).map { i =>
      val bytes = Array.fill(64 + rng.nextInt(512))(rng.nextInt.toByte)
      Row(i, bytes, Row("image/png", 64, 48, 0L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.mediaSchema).cache()
  }

  test("decode stub produces deterministic embeddings with the right shape") {
    val e1 = Multimodal.decodeToEmbedding(media, dim = 16)
    assert(e1.schema("embedding").dataType.typeName == "array")
    val a = e1.orderBy("media_id").select("embedding").collect().map(_.getSeq[Float](0))
    assert(a.forall(_.size == 16))
    val b = Multimodal.decodeToEmbedding(media.repartition(7), dim = 16)
      .orderBy("media_id").select("embedding").collect().map(_.getSeq[Float](0))
    assert(a.toSeq == b.toSeq) // partitioning-independent
  }

  test("extract emits thumbnail and frame samples") {
    val x = Multimodal.extract(media, thumbW = 4, thumbH = 4, nFrames = 3)
      .select("thumbnail", "frames").collect()
    assert(x.forall(_.getAs[Array[Byte]](0).length == 16))
    assert(x.forall(_.getSeq[Array[Byte]](1).size == 3))
  }

  test("decoded embeddings feed the similarity operators") {
    val e = Multimodal.decodeToEmbedding(media, dim = 16)
    val knn = Similarity.bruteForceKnn(e, e.filter(col("media_id") < 2), "media_id", "embedding", 3)
    assert(knn.count() == 6)
  }
}

class StreamingSessionSpec extends SparkSpec {
  import graft.time.{StreamingSession, TranscriptGen}

  test("streaming session aggregation matches batch sessionization counts") {
    val turns = TranscriptGen.generate(spark, 30, 15, 4).toDF().cache()
    // batch reference: PointInTime session ids
    val batch = graft.time.PointInTime.baseFeatures(turns)
      .groupBy("conv_id", "session_id").count()
    val batchSessions = batch.count()
    // streaming query over the same data via an in-memory source
    val schema = turns.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    turns.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).parquet(tmp)
    val agg = StreamingSession.sessionAgg(stream, gap = "30 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("sess").start()
    q.processAllAvailable()
    val streamed = spark.sql("SELECT count(*) FROM sess").collect()(0).getLong(0)
    q.stop()
    // session_window(gap 30m) closes a session when the NEXT turn starts
    // > 30m later; the batch rule uses strictly-greater too — counts match
    assert(streamed == batchSessions, s"stream $streamed vs batch $batchSessions")
  }
}
