package graft.time

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for the streaming feature operator (schema = the transcript
  * table subset it needs). Top-level case classes: encoders and state are
  * shipped to executors, an inner class would drag `$outer` along.
  */
final case class StreamTurn(conv_id: String, turn_idx: Int, role: String,
    text: String, tool: Option[String], ts: java.sql.Timestamp)

/** Per-conversation running state kept by the state store. */
final case class ConvFeatState(turnsSoFar: Long, cumTextLen: Long,
    cumToolCalls: Long, lastTsSecs: Long, sessionId: Long, hasPrev: Boolean)

/** One emitted feature row per turn — the streaming analogue of the batch
  * point-in-time columns of the same names.
  */
final case class StreamTurnFeatures(conv_id: String, turn_idx: Int,
    ts: java.sql.Timestamp, text_len: Long, turns_so_far: Long,
    cum_text_len: Long, cum_tool_calls: Long, secs_since_prev: Long,
    session_id: Long)

/** Streaming point-in-time features via `flatMapGroupsWithState` (the
  * custom-state path the session-window aggregate can't express): one
  * feature row per TURN as it arrives, carrying the conversation's running
  * cumulative state, exactly like the batch `PointInTime.baseFeatures`
  * window columns.
  *
  * Ordering contract: within a micro-batch a group's rows are sorted by
  * (ts, turn_idx) before folding; across micro-batches rows must arrive in
  * event-time order per conversation (state has already advanced — the
  * standard Structured Streaming append-mode reality). The leakage story
  * matches the batch layer: a turn's features depend only on turns at or
  * before its timestamp.
  *
  * State hygiene at 10^12-turn scale: event-time timeout frees a
  * conversation's state once the watermark passes its last turn by
  * `gapSecs` — idle mega-conversations don't pin the state store.
  */
object StreamingFeatures {

  def turnFeatures(turns: DataFrame, gapSecs: Long = 1800L,
                   watermark: String = "1 hour"): Dataset[StreamTurnFeatures] = {
    import turns.sparkSession.implicits._
    val src = if (turns.isStreaming) turns.withWatermark("ts", watermark) else turns
    val ds = src.selectExpr("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[StreamTurn]
    ds.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(gapSecs) _)
  }

  /** The per-group fold. Public within the package for direct unit testing;
    * deliberately NOT a closure over the enclosing frame.
    */
  private[time] def step(gapSecs: Long)(key: String, rows: Iterator[StreamTurn],
      state: GroupState[ConvFeatState]): Iterator[StreamTurnFeatures] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = rows.toVector.sortBy(t => (t.ts.getTime, t.turn_idx))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(
      ConvFeatState(0L, 0L, 0L, 0L, 0L, hasPrev = false))
    val out = Vector.newBuilder[StreamTurnFeatures]
    sorted.foreach { t =>
      val tsSecs = t.ts.getTime / 1000L
      val delta = if (st.hasPrev) tsSecs - st.lastTsSecs else 0L
      val sess = if (st.hasPrev && delta > gapSecs) st.sessionId + 1 else st.sessionId
      val len = if (t.text == null) 0L else t.text.length.toLong
      val tool = if (t.tool.isDefined) 1L else 0L
      st = ConvFeatState(st.turnsSoFar + 1, st.cumTextLen + len,
        st.cumToolCalls + tool, tsSecs, sess, hasPrev = true)
      out += StreamTurnFeatures(t.conv_id, t.turn_idx, t.ts, len,
        st.turnsSoFar, st.cumTextLen, st.cumToolCalls, delta, sess)
    }
    state.update(st)
    // free the conversation's state once the watermark passes its last turn
    // by the session gap. Batch execution carries no watermark (GroupState
    // throws on the query) and drops all state after the job anyway.
    try {
      state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(st.lastTsSecs * 1000L + gapSecs * 1000L)
    } catch { case _: UnsupportedOperationException => () }
    out.result().iterator
  }
}
