package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Bench

/** Two-parallelism scaling evidence (BASELINE.json north rule: throughput
  * scaling efficiency >= 0.8 between N and 4N executors). No real cluster
  * exists in this sandbox, so the same flagship job runs at local[N] and
  * local[4N] on the same parquet input; efficiency =
  * (throughput@4N) / (4 * throughput@N).
  *
  * Run: sbt "runMain graft.tools.ScalingBench [N]"   (default N=8)
  */
object ScalingBench {

  private def run(cores: Int, sfDir: String, nConvs: Long, nFormulas: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      // FIXED partition count at every parallelism level: on a real cluster
      // you add executors to the same job — the plan (and so the work) must
      // be identical between N and 4N, only the concurrency differs
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = Bench.benchTranscripts(spark, sfDir, nConvs)
    Bench.transcriptPipeline(spark, turns, nFormulas) // warm-up
    // median of 5 (best-of favors the lucky tail; JIT/GC/page-cache noise
    // is substantial in a shared JVM)
    val runs = (1 to 5).map { _ =>
      val ((n, _), sec) = Bench.timed(Bench.transcriptPipeline(spark, turns, nFormulas))
      (n, sec)
    }
    spark.stop()
    val med = runs.sortBy(_._2).apply(runs.size / 2)
    (med._1, med._1 / med._2)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 8
    // scaling evidence needs a compute-dominated job: default ~8M turns
    val nConvs = if (args.length > 1) args(1).toLong else 400000L
    // winner-formula count of the regeneration projection: production jobs
    // carry O(100) formulas; a thin projection makes this single-socket box
    // measure its memory-bandwidth ceiling instead of compute parallelism
    val nFormulas = if (args.length > 2) args(2).toInt else 40
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (rows1, thr1) = run(n, sfDir, nConvs, nFormulas)
    val (rows4, thr4) = run(4 * n, sfDir, nConvs, nFormulas)
    require(rows1 == rows4)
    val eff = thr4 / (4.0 * thr1)
    println(f"""{"rows":$rows1,"formulas":$nFormulas,"throughput_local[$n]":$thr1%.1f,"throughput_local[${4 * n}]":$thr4%.1f,"scaling_efficiency":$eff%.3f,"unit":"rows/sec"}""")
  }
}
