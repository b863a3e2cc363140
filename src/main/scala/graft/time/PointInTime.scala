package graft.time

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Point-in-time layer over the transcript table (SURVEY.md §2.10).
  *
  * Every feature at (conv_id, ts) is computed from rows with the same conv_id
  * and (ts, turn_idx) <= the current row only — `lag`, cumulative sums over
  * `rowsBetween(unboundedPreceding, currentRow)`, forward-fill via
  * `last(ignoreNulls)` — so recomputing on a time-truncated snapshot yields
  * identical vectors (zero temporal leakage; see LeakageSpec).
  *
  * Physical shape: all window functions share ONE WindowSpec
  * (partitionBy(conv_id), orderBy(ts, turn_idx)), so the whole frame costs a
  * single hash-exchange on conv_id plus one sort; everything downstream is a
  * narrow projection. `lead` helpers exist for fit-time labeling only and are
  * intentionally NOT part of [[baseFeatures]] (they would leak).
  */
object PointInTime {

  /** The one window ordering every point-in-time computation shares.
    * (ts, turn_idx) ordering = the stable turn ordering from the north rule.
    */
  def convWindow: WindowSpec =
    Window.partitionBy("conv_id").orderBy("ts", "turn_idx")

  private def cum(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** k-offset lag within the conversation. */
  def lagIn(c: Column, k: Int = 1): Column = lag(c, k).over(convWindow)

  /** k-offset lead — FIT-TIME ONLY (future-looking; never serve it). */
  def leadIn(c: Column, k: Int = 1): Column = lead(c, k).over(convWindow)

  /** Forward-fill: last non-null value at or before the current turn. */
  def ffill(c: Column): Column =
    last(c, ignoreNulls = true).over(cum(convWindow))

  /** Session id per conversation: increments when the gap since the previous
    * turn exceeds `gapSecs`. First turn of each conversation is session 0.
    */
  def sessionId(tsCol: Column, gapSecs: Long): Column = {
    val gap = unix_timestamp(tsCol) - unix_timestamp(lag(tsCol, 1).over(convWindow))
    sum(when(gap > gapSecs, 1).otherwise(0)).over(cum(convWindow))
  }

  /** Per-(conv_id, ts) numeric base-feature frame feeding the autofeat layer.
    *
    * Output columns (all point-in-time safe):
    *   conv_id, turn_idx, ts, role, tool,
    *   text_len, turn_idx_delta, secs_since_prev, turns_so_far,
    *   cum_text_len, cum_len_user, cum_len_assistant, cum_len_tool,
    *   cum_tool_calls, session_id, turns_in_session, secs_in_session,
    *   last_tool_ffill
    */
  def baseFeatures(turns: DataFrame, gapSecs: Long = 1800L): DataFrame = {
    val w = convWindow
    val wc = cum(w)
    val tsSecs = unix_timestamp(col("ts"))
    val prevTs = lag(tsSecs, 1).over(w)
    val gapFlag = when(tsSecs - prevTs > gapSecs, 1).otherwise(0)
    val rn = row_number().over(w)

    val roleLen = (r: String) =>
      sum(when(col("role") === r, length(col("text"))).otherwise(0L)).over(wc)

    val withBase = turns.select(
      col("conv_id"), col("turn_idx"), col("ts"), col("role"), col("tool"),
      length(col("text")).cast("long").as("text_len"),
      coalesce(col("turn_idx") - lag(col("turn_idx"), 1).over(w), lit(0)).as("turn_idx_delta"),
      coalesce(tsSecs - prevTs, lit(0L)).as("secs_since_prev"),
      rn.as("turns_so_far"),
      sum(length(col("text"))).over(wc).cast("long").as("cum_text_len"),
      roleLen("user").as("cum_len_user"),
      roleLen("assistant").as("cum_len_assistant"),
      roleLen("tool").as("cum_len_tool"),
      sum(when(col("tool").isNotNull, 1L).otherwise(0L)).over(wc).as("cum_tool_calls"),
      sum(gapFlag).over(wc).as("session_id"),
      // row number at which the current session started (same single window —
      // no second shuffle for the per-session counters below)
      max(when(gapFlag === 1 || rn === 1, rn)).over(wc).as("session_start_rn"),
      max(when(gapFlag === 1 || rn === 1, tsSecs)).over(wc).as("session_start_ts"),
      tsSecs.as("ts_secs"),
      last(col("tool"), ignoreNulls = true).over(wc).as("last_tool_ffill")
    )

    withBase
      .withColumn("turns_in_session", col("turns_so_far") - col("session_start_rn") + 1)
      .withColumn("secs_in_session", col("ts_secs") - col("session_start_ts"))
      .drop("session_start_rn", "session_start_ts", "ts_secs")
  }

  /** Names of the numeric feature columns produced by [[baseFeatures]] —
    * the start features for the autofeat synthesis layer.
    */
  val numericFeatureCols: Seq[String] = Seq(
    "turn_idx", "text_len", "turn_idx_delta", "secs_since_prev", "turns_so_far",
    "cum_text_len", "cum_len_user", "cum_len_assistant", "cum_len_tool",
    "cum_tool_calls", "session_id", "turns_in_session", "secs_in_session"
  )
}
