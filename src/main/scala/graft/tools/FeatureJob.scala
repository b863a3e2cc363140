package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ckpt.Checkpoint
import graft.time.{PointInTime, TranscriptGen}

/** Production feature-regeneration job (spark-submit entry, north rule):
  * transcript table -> point-in-time base features -> engineered winner
  * vectors, written as a resumable hash-bucketed parquet output with
  * per-partition lineage + row-count/feature-hash manifests.
  *
  *   spark-submit --class graft.tools.FeatureJob <jar> \
  *     <input parquet dir | gen:<nConvs>> <outDir> [nBuckets]
  *
  * Re-running the same command after a crash/kill skips completed buckets.
  */
object FeatureJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FeatureJob <input|gen:N> <outDir> [nBuckets]")
    val input = args(0)
    val outDir = args(1)
    val nBuckets = if (args.length > 2) args(2).toInt else 64
    val builder = SparkSession.builder()
      .appName("graft-feature-job")
      .config("spark.sql.session.timeZone", "UTC")
    // master comes from spark-submit on a cluster; default local for dev
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")
                   .config("spark.sql.shuffle.partitions",
                     Runtime.getRuntime.availableProcessors.toString)
                   .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val turns =
      if (input.startsWith("gen:")) TranscriptGen.generate(spark, input.drop(4).toLong).toDF()
      else graft.sources.Tables.read(spark, input) // iceberg on a cluster, parquet locally
    val base = PointInTime.baseFeatures(turns)
    val features = PointInTime.numericFeatureCols.filterNot(_ == "turn_idx")
    val out = base.select(
      Seq(col("conv_id"), col("turn_idx"), col("ts")) ++
        features.map(c => col(c).cast("double").as(c)): _*)
    val manifests = Checkpoint.writeResumable(out, outDir, "conv_id", nBuckets,
      lineage = s"input=$input|op=pit_base_features|v=1")
    val totalRows = manifests.map(_.rows).sum
    println(s"""{"buckets":$nBuckets,"rows":$totalRows,"outDir":"$outDir"}""")
    spark.stop()
  }
}
