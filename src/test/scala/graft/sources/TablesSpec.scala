package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {

  test("parquet read/write round-trip via Tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString + "/t"
    val df = spark.range(100).withColumn("ts", (col("id") * 60).cast("timestamp"))
    Tables.write(df, dir)
    assert(Tables.read(spark, dir).count() === 100)
    assert(Tables.format(spark) === "parquet")
  }

  test("bucketed tables join and aggregate with ZERO exchange") {
    val turns = spark.range(2000).select(
      concat(lit("c"), (col("id") % 50).cast("string")).as("conv_id"),
      col("id").as("turn_idx"), (col("id") % 7).cast("double").as("text_len"))
    val sessions = spark.range(50).select(
      concat(lit("c"), col("id").cast("string")).as("conv_id"),
      (col("id") * 10).cast("double").as("session_len"))
    Tables.writeBucketed(turns, "bt_turns", "conv_id", 8, sortCols = Seq("conv_id"))
    Tables.writeBucketed(sessions, "bt_sessions", "conv_id", 8, sortCols = Seq("conv_id"))
    val t = Tables.readTable(spark, "bt_turns")
    val s = Tables.readTable(spark, "bt_sessions")
    // co-located join: both sides report HashPartitioning(conv_id, 8) from
    // the bucket layout, so EnsureRequirements inserts NO exchange; a
    // broadcast join would also hide the shuffle, so force sort-merge
    val joined = t.join(s.hint("merge"), "conv_id")
    assert(joined.count() === 2000)
    val jPlan = joined.queryExecution.executedPlan.toString
    assert(!jPlan.contains("Exchange hashpartitioning"), jPlan.take(2000))
    // aggregation on the bucket key: partial+final back-to-back, no exchange
    val agg = t.groupBy("conv_id").agg(sum("text_len"))
    assert(agg.count() === 50)
    val aPlan = agg.queryExecution.executedPlan.toString
    assert(!aPlan.contains("Exchange hashpartitioning"), aPlan.take(2000))
    // and the UNBUCKETED equivalent does shuffle — the assertion above is
    // measuring the bucketing, not a vacuous plan
    val plainPlan = turns.groupBy("conv_id").agg(sum("text_len"))
      .queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange hashpartitioning"))
    spark.sql("DROP TABLE IF EXISTS bt_turns")
    spark.sql("DROP TABLE IF EXISTS bt_sessions")
  }

  test("readAsOf parquet fallback truncates on the event-time column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString + "/t2"
    val df = spark.range(100).withColumn("ts", (col("id") * 60).cast("timestamp"))
    Tables.write(df, dir)
    // cutoff at id=50 -> ts = 3000 s -> 51 rows at or before it
    val snap = Tables.readAsOf(spark, dir, tsMillis = 3000L * 1000)
    assert(snap.count() === 51)
    assert(snap.agg(max("id")).collect()(0).getLong(0) === 50L)
  }
}
