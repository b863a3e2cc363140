package graft.time

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tagged input row of the streaming as-of join: left rows carry an
  * empty payload, right rows carry the named payload values. Top-level case
  * classes — encoders and state ship to executors without `$outer`.
  */
final case class AsOfIn(key: String, ts: java.sql.Timestamp, isRight: Boolean,
                        payload: Map[String, Double])

/** Per-key state: the latest right row's event time (micros) + payload. */
final case class AsOfRightState(tsMicros: Long, payload: Map[String, Double])

/** One enriched left row; `payload` is empty when no (in-tolerance) right
  * row preceded it.
  */
final case class AsOfOut(key: String, ts: java.sql.Timestamp,
                         payload: Map[String, Double])

/** Streaming as-of join — the low-latency serving analogue of
  * [[AsOfJoin.asof]] (backward direction): each left row is enriched with
  * the latest right payload at or before its timestamp, keyed per
  * conversation. State is ONE right payload per key, freed by event-time
  * timeout `stateTtlSecs` past the key's last activity — bounded by the
  * watermark horizon like the other streaming operators.
  *
  * Ordering contract (same as [[StreamingFeatures]]): within a micro-batch
  * a key's rows are sorted by (ts, right-before-left) before folding — so a
  * right row at exactly the left ts IS visible, matching the batch tie
  * rule; across micro-batches rows must arrive in event-time order per key
  * (state has already advanced — the standard append-mode reality).
  * `toleranceSecs` mirrors the batch bounded-staleness gate: a right match
  * older than the bound yields an empty payload.
  *
  * Works identically on batch frames (each key = one group, sorted fold =
  * exact as-of semantics), so specs assert batch ≡ stream ≡ AsOfJoin.
  */
object StreamingAsOf {

  /** `left` and `right` must be BOTH streaming or BOTH batch (Spark cannot
    * union across modes). Output: left columns key/ts + `asof_<c>` per
    * payload column.
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightPayload: Seq[String], prefix: String = "asof_",
           watermark: String = "1 hour", stateTtlSecs: Long = 86400L,
           toleranceSecs: Option[Double] = None): DataFrame = {
    import left.sparkSession.implicits._
    def q(c: String) = col(s"`${c.replace("`", "``")}`")
    val lIn = left.select(q(keyCol).cast("string").as("key"), q(tsCol).as("ts"),
      lit(false).as("isRight"),
      map().cast("map<string,double>").as("payload"))
    val rIn = right.select(q(keyCol).cast("string").as("key"), q(tsCol).as("ts"),
      lit(true).as("isRight"),
      map_from_arrays(
        array(rightPayload.map(lit): _*),
        array(rightPayload.map(c => q(c).cast("double")): _*)).as("payload"))
    val unioned = lIn.unionByName(rIn)
    val src = if (unioned.isStreaming) unioned.withWatermark("ts", watermark) else unioned
    val out = src.as[AsOfIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(stateTtlSecs, toleranceSecs) _)
    out.select(
      Seq(col("key").as(keyCol), col("ts").as(tsCol)) ++
        rightPayload.map(c => col("payload").getItem(c).as(prefix + c)): _*)
  }

  private[time] def step(ttlSecs: Long, toleranceSecs: Option[Double])(
      key: String, rows: Iterator[AsOfIn],
      state: GroupState[AsOfRightState]): Iterator[AsOfOut] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    // (ts, right-first): a right row at exactly a left row's ts is visible
    val sorted = rows.toVector.sortBy(r => (r.ts.getTime, !r.isRight))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(AsOfRightState(Long.MinValue, Map.empty))
    val out = Vector.newBuilder[AsOfOut]
    sorted.foreach { r =>
      val tMicros = r.ts.getTime * 1000L
      if (r.isRight) {
        if (tMicros >= st.tsMicros) st = AsOfRightState(tMicros, r.payload)
      } else {
        val fresh = toleranceSecs match {
          case Some(tol) => st.tsMicros != Long.MinValue &&
            (tMicros - st.tsMicros) <= (tol * 1e6).toLong
          case None => st.tsMicros != Long.MinValue
        }
        out += AsOfOut(r.key, r.ts, if (fresh) st.payload else Map.empty)
      }
    }
    state.update(st)
    try {
      state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(sorted.last.ts.getTime + ttlSecs * 1000L)
    } catch { case _: UnsupportedOperationException => () }
    out.result().iterator
  }
}
