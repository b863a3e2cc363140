package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Variance probe for the LSH candidate-pair query (temporary diagnostics). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.pipeline.Dedup.lshCandidatePairs(d, "doc_id", "text", numHashes = 8, bands = 4).count()
      println(f"LSH run $i: pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // bucket skew: how many docs share the largest band bucket?
    val based = d.select(col("doc_id").as("id"),
      transform(graft.pipeline.Dedup.wordNgrams(col("text"), 3), s => graft.pipeline.Dedup.baseHash(s)).as("__bases"))
    val banded = based.select(col("id"), graft.pipeline.Dedup.minhashFromBases(col("__bases"), 8).as("sig"))
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(3)),
        b => concat_ws("_", slice(col("sig"), b * 2 + 1, lit(2))))).as(Seq("band", "bucket")))
    banded.groupBy("band", "bucket").count().orderBy(desc("count")).show(10, truncate = false)
    spark.stop()
  }
}
