package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming MinHash-band near-dup candidates vs the batch hub-star: the
  * same pair set, including state carried ACROSS micro-batches.
  */
class StreamingNearDupSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val rows: Seq[(Long, String, Timestamp)] = {
    val dup = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    Seq(
      (1L, dup, ts(10)),
      (2L, "completely different content describing spark catalyst optimizer internals", ts(20)),
      (3L, dup, ts(30)),
      (4L, near, ts(40)),
      (5L, "another unrelated document about distributed shuffle services", ts(50)),
      (6L, dup, ts(60)),
      (7L, near, ts(70)))
  }

  test("streaming pairs match the batch hub-star across micro-batches") {
    import spark.implicits._
    val docs = rows.toDF("doc_id", "text", "ts").cache()
    // batch hub-star oracle: cap 1 forces every shared bucket to the
    // min-id hub star — the shape the streaming operator emits
    val oracle = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        numHashes = 16, bands = 4, maxBucketSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oracle.nonEmpty, "fixture must produce near-dup pairs")

    // batch execution of the streaming operator agrees
    val batchPairs = StreamingNearDup.candidatePairs(docs)
      .collect().map(p => (p.id1, p.id2)).toSet
    assert(batchPairs == oracle, s"batch-mode $batchPairs vs oracle $oracle")

    // streaming across micro-batches (in-order feed -> hub = min id)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingNearDup.candidatePairs(
      src.toDS().toDF("doc_id", "text", "ts"), watermark = "10000 hours")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("neardup").start()
    val (b1, b2) = rows.partition(_._1 <= 3)
    src.addData(b1)
    q.processAllAvailable()
    src.addData(b2) // bucket hubs must persist, not restart
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT id1, id2 FROM neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oracle, s"streamed $streamed vs oracle $oracle")
  }
}
