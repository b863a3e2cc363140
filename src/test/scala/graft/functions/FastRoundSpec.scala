package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FastRound must be BIT-identical to Catalyst Round on doubles — the
  * driver oracles hash rounded columns, so a single ulp of divergence on
  * one row is a round regression. Pins (a) direct expression eval against
  * Catalyst's Round on constructed near-ties, specials and wide fuzz, and
  * (b) the codegen path through a DataFrame comparison.
  */
class FastRoundSpec extends SparkSpec {
  import spark.implicits._

  private def catalystRound(d: Double, s: Int): Double =
    org.apache.spark.sql.catalyst.expressions.Round(
      org.apache.spark.sql.catalyst.expressions.Literal(d),
      org.apache.spark.sql.catalyst.expressions.Literal(s)).eval(null).asInstanceOf[Double]

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def check(d: Double, s: Int): Unit = {
    val fast = new FastRoundEval(s).eval(d)
    val ref = catalystRound(d, s)
    assert(bits(fast) == bits(ref),
      s"fast_round($d, $s) = $fast (${bits(fast)}) != catalyst $ref (${bits(ref)})")
  }

  private val scales = Seq(0, 2, 5, 6, 9, 15)

  test("specials: NaN, infinities, zeros, subnormals, extremes") {
    val specials = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue, 1e-310, -1e-310,
      Double.MaxValue, -Double.MaxValue, 1e308, -1e308, 4.9e-324,
      1e-9, -1e-9, 4.9999999e-7, -4.9999999e-7, 5.0000001e-7, -5.0000001e-7,
      2.251799813685248e15, 4.5e9, -4.5e9, 1e16, -1e16)
    for (d <- specials; s <- scales) check(d, s)
  }

  test("constructed near-ties: k + 0.5 ulps at every scale") {
    val rng = new scala.util.Random(42)
    for (s <- scales) {
      val pow = math.pow(10.0, s)
      for (_ <- 0 until 4000) {
        val k = rng.nextLong() % math.max(1L, (4.0e15 / pow).toLong)
        val base = (k + 0.5) / pow
        var lo = base
        var hi = base
        for (_ <- 0 until 3) { lo = Math.nextDown(lo); hi = Math.nextUp(hi) }
        var d = lo
        while (d <= hi && !d.isNaN) { check(d, s); d = Math.nextUp(d) }
        // integers and just-off-integers
        check(k / pow, s)
        check(Math.nextUp(k / pow), s)
        check(Math.nextDown(k / pow), s)
      }
    }
  }

  test("raw-bits fuzz across the whole double range") {
    val rng = new scala.util.Random(7)
    var i = 0
    while (i < 200000) {
      val d = java.lang.Double.longBitsToDouble(rng.nextLong())
      val s = scales(i % scales.length)
      check(d, s)
      i += 1
    }
  }

  test("magnitude-swept decimal fuzz") {
    val rng = new scala.util.Random(11)
    var i = 0
    while (i < 200000) {
      val mag = math.pow(10.0, rng.nextInt(25) - 12)
      val d = (rng.nextDouble() - 0.5) * mag
      val s = scales(i % scales.length)
      check(d, s)
      i += 1
    }
  }

  test("codegen path: DataFrame fast_round == round, bit-for-bit") {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    val rng = new scala.util.Random(3)
    val vals = (0 until 50000).map { i =>
      if (i % 97 == 0) java.lang.Double.longBitsToDouble(rng.nextLong())
      else (rng.nextDouble() - 0.5) * math.pow(10.0, rng.nextInt(20) - 8)
    } ++ Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0, -1e-9)
    val df = vals.toDF("d").repartition(4)
    for (s <- Seq(5, 6, 9)) {
      val fr = bridge.column(FastRound(bridge.expression(col("d")), s))
      val diff = df.select(col("d"), round(col("d"), s).as("r"), fr.as("f"))
        .filter(!(col("r") <=> col("f")) ||
          // <=> treats +0.0 == -0.0 and groups NaNs; re-check bits on the rest
          (col("r") === 0.0 && col("f") === 0.0))
        .collect()
        .filter(r => java.lang.Double.doubleToLongBits(r.getDouble(1)) !=
          java.lang.Double.doubleToLongBits(r.getDouble(2)))
      assert(diff.isEmpty, s"scale $s diverged on ${diff.take(3).mkString(", ")}")
    }
  }
}
