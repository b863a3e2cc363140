package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming exact deduplication for document ingestion: keep
  * the FIRST arrival per normalized-text fingerprint, with the dedup state
  * bounded by an event-time watermark.
  *
  * Physical shape: `dropDuplicatesWithinWatermark` keeps one state-store
  * entry per fingerprint and evicts entries whose event time ages past the
  * watermark — the state never grows beyond the watermark horizon, which is
  * what makes exact streaming dedup viable on an unbounded 100 TB/day feed
  * (an unwatermarked `dropDuplicates` would accrete every fingerprint ever
  * seen). Duplicates arriving within the watermark window are suppressed
  * exactly; re-arrivals after eviction pass through — the standard
  * at-watermark-horizon guarantee, same as any streaming dedup. Downstream
  * batch jobs that need FOREVER-exact dedup run [[Dedup.exact]] over the
  * compacted table instead; this operator is the low-latency front door.
  *
  * Works identically on a batch frame (falls back to a plain
  * fingerprint-dropDuplicates) so specs can assert batch ≡ stream.
  */
object StreamingDedup {

  /** Deduplicate a (possibly streaming) documents frame by text
    * fingerprint. `tsCol` drives the watermark; output keeps the input
    * columns plus the fingerprint.
    *
    * Representative row: the streaming path keeps the first-PROCESSED
    * arrival (state-store semantics — processing order, which for an
    * in-order feed is the event-time-first row). The batch fallback keeps
    * the event-time-FIRST row per fingerprint (min ts, earliest-arrival
    * semantics, deterministic up to ts ties) — a window row_number, one
    * shuffle + sort, spillable on degenerate fingerprints like
    * [[Dedup.exact]] (a bare dropDuplicates would keep an arbitrary row).
    */
  def dedup(docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
            watermark: String = "1 hour"): DataFrame = {
    val withFp = docs.withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
    if (withFp.isStreaming)
      withFp.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("fingerprint")
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fingerprint").orderBy(col(tsCol).asc)
      withFp.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }
}
