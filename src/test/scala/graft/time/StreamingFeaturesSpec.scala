package graft.time

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming per-turn features (flatMapGroupsWithState) vs the batch
  * point-in-time window columns: identical values, including state carried
  * ACROSS micro-batches.
  */
class StreamingFeaturesSpec extends SparkSpec {

  test("streaming turn features match batch baseFeatures across micro-batches") {
    val turns = TranscriptGen.generate(spark, 20, 12, 9).toDF().cache()
    val batch = PointInTime.baseFeatures(turns)
      .select("conv_id", "turn_idx", "text_len", "turns_so_far",
        "cum_text_len", "cum_tool_calls", "secs_since_prev", "session_id")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = turns.selectExpr("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[StreamTurn].collect().sortBy(t => (t.conv_id, t.turn_idx))
    val (b1, b2) = rows.partition(t => t.turn_idx < 5) // split mid-conversation
    val src = MemoryStream[StreamTurn]
    // large watermark: the test's batch split is by turn_idx, so batch 2
    // holds rows event-time-older than batch 1's max ts — they must not be
    // dropped as late
    val out = StreamingFeatures.turnFeatures(src.toDS().toDF(), watermark = "10000 hours")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("turnfeat").start()
    src.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    src.addData(b2.toIndexedSeq) // state must continue, not restart
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      """SELECT conv_id, turn_idx, text_len, turns_so_far, cum_text_len,
        |cum_tool_calls, secs_since_prev, session_id FROM turnfeat""".stripMargin)
    assert(streamed.count() == batch.count())
    val diff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
    assert(diff == 0, s"$diff mismatching feature rows between stream and batch")
  }

  test("batch-mode execution of the streaming operator matches too") {
    val turns = TranscriptGen.generate(spark, 10, 8, 3).toDF()
    val batch = PointInTime.baseFeatures(turns)
      .select("conv_id", "turn_idx", "turns_so_far", "cum_text_len", "session_id")
    val viaState = StreamingFeatures.turnFeatures(turns)
      .select("conv_id", "turn_idx", "turns_so_far", "cum_text_len", "session_id")
    assert(viaState.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(viaState).count() == 0)
  }
}
