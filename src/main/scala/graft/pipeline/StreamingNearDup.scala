package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One exploded MinHash band row. Top-level case classes: encoders and
  * state ship to executors, an inner class would drag `$outer` along.
  */
final case class BandRow(doc_id: Long, ts: java.sql.Timestamp, band: Int, bucket: String)

/** Per-(band, bucket) state: the bucket's hub (first doc seen). */
final case class BucketHub(hub: Long, lastTsSecs: Long)

/** An emitted near-dup candidate pair (id1 < id2). */
final case class StreamPair(id1: Long, id2: Long)

/** Structured-Streaming MinHash+LSH near-duplicate candidates — the
  * streaming front door beside [[StreamingDedup]]'s exact dedup: documents
  * sharing any signature band bucket within the watermark horizon emit a
  * candidate pair against the bucket's HUB (its first-seen document) — the
  * streaming analogue of the batch hub-star ([[Dedup.lshCandidatePairs]]'s
  * mega-bucket shape), whose pairs keep near-dup clusters transitively
  * connected for downstream canonical-id resolution. State is ONE hub per
  * band bucket, freed by event-time timeout `stateTtlSecs` past the
  * bucket's last arrival — bounded by the watermark horizon, viable on an
  * unbounded feed.
  *
  * Emission is at-least-once per (pair, band): two docs sharing several
  * bands emit the pair once per shared band (batch consumers dedupe;
  * connected components is insensitive to duplicates). Like
  * [[StreamingDedup]], the hub is the first-PROCESSED doc — for an
  * in-order feed, the smallest-id doc, matching the batch hub-star exactly
  * (pinned by StreamingNearDupSpec).
  *
  * Works identically on a batch frame (flatMapGroupsWithState executes
  * per-group with empty state, no timeouts) so specs can assert
  * batch ≡ stream.
  */
object StreamingNearDup {

  def candidatePairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                     tsCol: String = "ts", numHashes: Int = 16, bands: Int = 4, n: Int = 3,
                     watermark: String = "1 hour",
                     stateTtlSecs: Long = 3600L): Dataset[StreamPair] = {
    import docs.sparkSession.implicits._
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands
    val src = if (docs.isStreaming) docs.withWatermark(tsCol, watermark) else docs
    // signature materialized in its own select: referenced once per BAND by
    // the banding transform, so inlining it would recompute the full
    // signature (every n-gram hashed, numHashes array_min reductions)
    // `bands` times per row — same shape as the batch lshCandidatePairs
    val banded = src.select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        Dedup.minhashSignature(col(textCol), numHashes, n).as("__sig"))
      .select(col("doc_id"), col("ts"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => concat_ws("_", slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
        )).as(Seq("band", "bucket")))
      .as[BandRow]
    banded.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(stateTtlSecs) _)
  }

  /** The per-bucket fold. Rows within a micro-batch are processed in doc_id
    * order (determinism within the batch); the hub is the first doc ever
    * seen for the bucket.
    */
  private[pipeline] def step(ttlSecs: Long)(key: (Int, String), rows: Iterator[BandRow],
      state: GroupState[BucketHub]): Iterator[StreamPair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = rows.toVector.sortBy(_.doc_id)
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(BucketHub(sorted.head.doc_id, 0L))
    val out = Vector.newBuilder[StreamPair]
    var lastTs = st.lastTsSecs
    sorted.foreach { r =>
      if (r.doc_id != st.hub)
        out += StreamPair(math.min(st.hub, r.doc_id), math.max(st.hub, r.doc_id))
      if (r.ts != null) lastTs = math.max(lastTs, r.ts.getTime / 1000L)
    }
    st = BucketHub(st.hub, lastTs)
    state.update(st)
    try {
      state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(lastTs * 1000L + ttlSecs * 1000L)
    } catch { case _: UnsupportedOperationException => () }
    out.result().iterator
  }
}
