package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag corpus documents that share
  * word n-grams with a (small) benchmark/eval set — the standard
  * decontamination pass before pre-training.
  *
  * Scale shape: the benchmark side is distinct-ed and BROADCAST (an eval
  * suite is millions of n-grams at most — megabytes); corpus n-grams are
  * exploded and inner-joined map-side, so only MATCHING grams survive to
  * the per-doc aggregation shuffle. The 100 TB corpus is scanned once,
  * never shuffled in full: the only exchange carries the (rare) overlap
  * hits. No all-pairs anything.
  */
object Contamination {

  /** Distinct word n-grams of the benchmark set, one row per gram. */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int = 3): DataFrame =
    bench.select(explode(Dedup.wordNgrams(col(textCol), n)).as("gram")).distinct()

  /** Per-doc count of distinct n-grams shared with the benchmark; docs
    * with zero overlap are absent (join-reduced) — use
    * [[flagContaminated]] for a full-corpus verdict column.
    */
  def overlapCounts(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val bg = benchmarkGrams(bench, textCol, n)
    corpus
      .select(col(idCol), explode(Dedup.wordNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(bg), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap")) // grams are distinct within a doc
  }

  /** Every corpus row with its benchmark-overlap count and a
    * `contaminated` verdict (≥ minOverlap shared distinct n-grams).
    */
  def flagContaminated(corpus: DataFrame, bench: DataFrame, idCol: String,
                       textCol: String, n: Int = 3, minOverlap: Int = 5): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val counts = overlapCounts(corpus, bench, idCol, textCol, n)
    corpus.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }
}
