package graft.time

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sort-merge as-of join (SURVEY.md §2.10): for each left row (key, ts),
  * attach the payload of the latest right row with r.ts <= l.ts and the same
  * key. Spark has no built-in as-of join; composing join+window explodes
  * (every left row matches all earlier right rows before ranking).
  *
  * Physical shape: union-tag both sides, then forward-fill the right payload
  * with `last(_, ignoreNulls).over(key, salt | ts, tag)` and keep the left
  * rows — ONE hash exchange + ONE sort, all inside native WindowExec
  * (whole-stage-codegen-friendly, no Row materialization; a custom
  * mapPartitions merge measured ~2x slower at local[32] from GC pressure).
  *
  * Skew: keys whose LEFT row count exceeds `skewThreshold` are salted into
  * `salts` sub-partitions; the right side is replicated to every salt of a
  * skewed key (correct because each salted partition then sees the full
  * right timeline for the key). Right-side-heavy skew would need ts-range
  * salting with boundary carry-in — not needed for the summary-table shape.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightPayload: Seq[String], prefix: String = "asof_",
           skewThreshold: Long = 2000000L, salts: Int = 8,
           numPartitions: Int = 0,
           /** Test seam: force the built-in unionByName formulation even
             * when CoPartitionedUnion is plannable (parity coverage for
             * sessions without GraftExtensions).
             */
           forceBuiltinUnion: Boolean = false,
           /** Caller-supplied skew knowledge: `Some(keys)` salts exactly
             * those keys and SKIPS the detection scan; `Some(Nil)` asserts
             * "no skew" and also skips it. `None` (default) runs the
             * bounded groupBy-count pre-scan. At 10^12 rows that scan is an
             * extra full pass + aggregate per asof() call, so production
             * pipelines that already know their mega-conversations (or
             * cache one detection result across many joins) should pass it
             * in.
             */
           skewKeys: Option[Seq[String]] = None,
           /** "backward" (default): latest right row with r.ts <= l.ts;
             * "forward": earliest right row with r.ts >= l.ts — the same
             * one-exchange window plan over a mirrored sort order.
             */
           direction: String = "backward",
           /** Bounded staleness (feature-store semantics): a match further
             * than this many seconds from l.ts (in the join direction)
             * yields NULL payload instead — evaluated per row after the
             * forward-fill, zero extra plan nodes.
             */
           toleranceSecs: Option[Double] = None): DataFrame = {
    val spark = left.sparkSession
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"

    // top skewed keys on the left (bounded collect), unless supplied
    val skewedKeys: Seq[String] = skewKeys.getOrElse(
      left.groupBy(col(keyCol).cast("string").as("__k")).count()
        .filter(col("count") > skewThreshold)
        .orderBy(desc("count")).limit(1000)
        .collect().map(_.getString(0)).toSeq)
    val isSkewed = if (skewedKeys.isEmpty) lit(false)
    else col(keyCol).cast("string").isin(skewedKeys: _*)

    val lCols = left.columns.toSeq
    def q(c: String) = col(s"`${c.replace("`", "``")}`")

    // aligned union: [__k, __ts, __salt, __tag, leftCols..., payload...]
    val lFrame = left.select(
      Seq(col(keyCol).cast("string").as("__k"), col(tsCol).as("__ts"),
        when(isSkewed, pmod(xxhash64(col(tsCol)), lit(salts)).cast("int"))
          .otherwise(lit(0)).as("__salt"),
        lit(1).as("__tag")) ++
        lCols.map(q) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(prefix + c)): _*)
    val saltArr = array((0 until salts).map(lit): _*)
    val rFrame = right.select(
      Seq(col(keyCol).cast("string").as("__k"), col(tsCol).as("__ts"),
        explode(when(isSkewed, saltArr).otherwise(array(lit(0)))).as("__salt"),
        lit(0).as("__tag")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => q(c).as(prefix + c)): _*)

    // right rows (tag 0) sort before left rows at equal ts => r.ts == l.ts
    // is visible to the left row, matching "latest right with r.ts <= l.ts".
    // Forward direction mirrors the scan: ts DESC, so the carried value is
    // the latest right row SEEN while descending = the EARLIEST right row
    // with r.ts >= l.ts (equal-ts rights still sort before the left row).
    val w = Window.partitionBy(col("__k"), col("__salt"))
      .orderBy(if (fwd) col("__ts").desc else col("__ts").asc, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // union the tagged frames. With GraftExtensions, the custom
    // CoPartitionedUnion keeps the left side's hash partitioning visible to
    // the window (built-in UnionExec reports UnknownPartitioning, forcing a
    // full reshuffle of base + summaries even when the left side — the big
    // one — is already partitioned by the key, e.g. fresh out of the
    // point-in-time window layer). EnsureRequirements still inserts the
    // exchanges needed to make each side key-clustered, so semantics are
    // identical either way.
    //
    // Skewed keys force the BUILT-IN union: salting only helps if the
    // window's ClusteredDistribution(__k, __salt) actually materializes as a
    // (key, salt) exchange, and any partitioning on __k alone satisfies that
    // distribution by the subset rule — so above the key-partitioned custom
    // union NO exchange is inserted and every salt of a hot key would land
    // in one task's sort, silently un-doing the mitigation. The built-in
    // union reports UnknownPartitioning, which guarantees the (__k, __salt)
    // exchange that spreads each hot key across `salts` partitions. The
    // shuffle-elimination fast path and the skew path are mutually
    // exclusive by construction.
    val unioned: DataFrame =
      if (!forceBuiltinUnion && skewedKeys.isEmpty &&
          graft.plans.CoPartitionedUnion.available(spark)) {
        val lp = lFrame.queryExecution.analyzed
        val rp = rFrame.queryExecution.analyzed
        require(lp.output.map(_.name) == rp.output.map(_.name),
          "as-of union sides must be column-aligned")
        org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
          graft.plans.CoPartitionedUnion(lp, rp,
            lp.output.filter(_.name == "__k"), rp.output.filter(_.name == "__k")))
      } else lFrame.unionByName(rFrame)

    // the payload struct is null on left rows, so last(ignoreNulls=true)
    // carries the latest RIGHT payload forward into each left row; the
    // matched row's own ts (__mts) rides inside the struct for the
    // tolerance gate
    val filled = unioned
      .withColumn("__pay",
        when(col("__tag") === 0,
          struct(rightPayload.map(c => q(prefix + c)) :+ col("__ts").as("__mts"): _*)))
      .withColumn("__carry", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val withinTol: Column = toleranceSecs match {
      case None => lit(true)
      case Some(tol) =>
        val dist =
          if (fwd) col("__carry").getField("__mts").cast("double") - col("__ts").cast("double")
          else col("__ts").cast("double") - col("__carry").getField("__mts").cast("double")
        dist <= lit(tol)
    }
    filled.select(lCols.map(q) ++
      rightPayload.map { c =>
        when(withinTol, col("__carry").getField(prefix + c)).as(prefix + c)
      }: _*)
  }
}
