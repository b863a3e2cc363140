package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and token-budget data mixing.
  *
  * Every operator here is driven by one portable primitive, [[hashU]]: a
  * uniform deterministic pseudo-random in [0,1) derived from md5 of
  * (seed, id) — the same construction as Dedup.baseHash, computable
  * bit-identically in any engine with md5 (the DuckDB oracles mirror it
  * exactly), so samples are reproducible across engines, runs, and
  * cluster sizes. No `rand()` anywhere: Spark's rand is partition-layout
  * dependent, which at 10¹² rows means a different sample after every
  * repartition (see the AQE note on FeatSel.withShuffledCopy).
  *
  * Scale shape: [[hashSample]] and [[stratifiedSample]] are pure map-side
  * filters (zero shuffles; the per-stratum rate table is broadcast);
  * [[tokenBudgetMix]] is one hash shuffle on the source column + one
  * window sort per source — each source an independent stream.
  */
object Sampling {

  /** Uniform deterministic hash of (seed, id) in [0,1): first 15 hex chars
    * of md5 as a 60-bit integer, scaled by 2⁻⁶⁰.
    */
  def hashU(id: Column, seed: Long): Column =
    conv(substring(md5(concat_ws(":", lit(seed), id.cast("string"))), 1, 15), 16, 10)
      .cast("long") / lit(1152921504606846976.0) // 2^60

  /** Keep each row iff hashU(seed, id) < fraction — an exact, reproducible
    * Bernoulli sample (map-side filter; no shuffle, no state).
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, seed: Long): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.where(hashU(col(idCol), seed) < fraction)
  }

  /** Per-stratum Bernoulli rates: keep a row of stratum s iff
    * hashU(seed, id) < fractions(s); strata absent from the map get
    * `defaultFraction` (0 = drop). The rate table is broadcast — the
    * corpus never shuffles.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double], seed: Long,
                       defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "all fractions must be in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val rates = fractions.toSeq.toDF("__stratum", "__frac")
    df.join(broadcast(rates), df(stratumCol) === col("__stratum"), "left")
      .where(hashU(col(idCol), seed) < coalesce(col("__frac"), lit(defaultFraction)))
      .drop("__stratum", "__frac")
  }

  /** Token-budget data mixing: per source, documents are ranked by a
    * deterministic shuffle key (hashU) and kept while the running token
    * total stays within that source's budget — the standard "hit the
    * target token mixture" pass of a pre-training data pipeline. Sources
    * absent from `budgets` are dropped. Output: kept rows plus
    * (mix_rank, cum_tokens) for auditability.
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, tokensCol: String,
                     sourceCol: String, budgets: Map[String, Long],
                     seed: Long): DataFrame = {
    require(budgets.values.forall(_ >= 0L), "budgets must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val b = budgets.toSeq.toDF("__source", "__budget")
    // materialize the shuffle key ONCE: both windows then sort on the same
    // attribute, so the plan carries one exchange + ONE sort (inline hashU
    // expressions differ per window instance and would cost a second sort)
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("__u"), col(idCol))
    df.join(broadcast(b), df(sourceCol) === col("__source"), "inner")
      .withColumn("__u", hashU(col(idCol), seed))
      .withColumn("mix_rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(greatest(col(tokensCol).cast("long"), lit(1L))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum_tokens") <= col("__budget"))
      .drop("__source", "__budget", "__u")
  }
}
