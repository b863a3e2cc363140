package graft.time

import java.sql.Timestamp
import java.util.SplittableRandom

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic transcript generator (FIXTURES.md §F1).
  *
  * Embarrassingly parallel: `spark.range(nConvs)` is split across executors and
  * each conversation is derived purely from (seed, conv index) via a
  * SplittableRandom stream, so the same (seed, nConvs) always produces the
  * identical table regardless of parallelism or partition count. No shuffle.
  *
  * Skew: conversation 0 is a "mega" conversation with ~100x the median turn
  * count, to exercise the salting/skew paths of the point-in-time layer.
  */
object TranscriptGen {

  private val roles = Array("user", "assistant", "tool")
  private val tools = Array("bash", "search", "read", "write")
  private val sessionGapSecs = 30L * 60L // injected gaps > 30 min

  /** Mixes seed and conv index into a per-conversation RNG seed. */
  private def convSeed(seed: Long, conv: Long): Long =
    (seed * 0x9e3779b97f4a7c15L) ^ (conv * 0xc2b2ae3d27d4eb4fL)

  def turnsFor(seed: Long, conv: Long, meanTurns: Int): Iterator[Turn] = {
    val rng = new SplittableRandom(convSeed(seed, conv))
    val nTurns =
      if (conv == 0L) math.max(2, meanTurns * 100)
      else 2 + rng.nextInt(2 * meanTurns - 2) // uniform, mean ~= meanTurns
    val convId = f"c$conv%06d"
    // conversation start: epoch + (convSeed mod 30 days), microsecond-free
    val startSecs = java.lang.Long.remainderUnsigned(convSeed(seed, conv + 7), 30L * 24 * 3600)
    var ts = startSecs * 1000L
    (0 until nTurns).iterator.map { i =>
      val role = roles((i + rng.nextInt(3) % 2) % 3)
      val tool = if (role == "tool") tools(rng.nextInt(tools.length)) else null
      // text length ~ LogNormal(mu=4, sigma=1) clipped to [1, 4096]
      val len = math.min(4096, math.max(1, math.exp(4.0 + rng.nextGaussian()).toInt))
      val sb = new java.lang.StringBuilder(len)
      var j = 0
      while (j < len) { sb.append(('a' + rng.nextInt(26)).toChar); j += 1 }
      // per-turn gap ~ Exp(mean 60s); every ~20th turn jumps past the session gap
      val gapSecs =
        if (i > 0 && i % 20 == 0) sessionGapSecs + 1 + rng.nextInt(3600)
        else math.max(1L, (-60.0 * math.log(rng.nextDouble())).toLong)
      if (i > 0) ts += gapSecs * 1000L
      Turn(convId, i, role, sb.toString, tool, new Timestamp(ts))
    }
  }

  /** Deterministic transcript table of ~nConvs * meanTurns turns. */
  def generate(spark: SparkSession, nConvs: Long, meanTurns: Int = 20, seed: Long = 42L,
               partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0L, nConvs, 1L, p).flatMap(c => turnsFor(seed, c, meanTurns))
  }
}
