package graft.time

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming analogue of the batch sessionization (SURVEY.md
  * §2.10 notes the reference is batch-only; this covers the streaming shape
  * for transcript ingestion): event-time session windows per conv_id with a
  * watermark, emitting per-session aggregates as sessions close.
  */
object StreamingSession {

  /** Build the streaming aggregation over a (possibly streaming) turns
    * frame: session_window(ts, gap) per conv_id -> turns, text chars,
    * tool calls. Works identically on a batch frame (used by the spec's
    * memory-sink smoke run).
    */
  def sessionAgg(turns: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame = {
    val src = if (turns.isStreaming) turns.withWatermark("ts", watermark) else turns
    src.groupBy(col("conv_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("turns"),
        sum(length(col("text"))).as("chars"),
        sum(when(col("tool").isNotNull, 1L).otherwise(0L)).as("tool_calls"))
      .select(col("conv_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("turns"), col("chars"), col("tool_calls"))
  }
}
