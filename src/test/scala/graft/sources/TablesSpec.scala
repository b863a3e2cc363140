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
