package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class YeoJohnsonSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side implementation of the profile log-likelihood
    * (the quantity sklearn's PowerTransformer Brent-maximizes), evaluated
    * exactly over a fine grid — the oracle for the distributed grid-zoom fit.
    */
  private def bruteForceLambda(xs: Array[Double], lo: Double = -3, hi: Double = 3): Double = {
    def psi(x: Double, lam: Double): Double =
      if (x >= 0) {
        if (math.abs(lam) < 1e-10) math.log1p(x) else (math.pow(x + 1, lam) - 1) / lam
      } else {
        if (math.abs(2 - lam) < 1e-10) -math.log1p(-x)
        else -(math.pow(1 - x, 2 - lam) - 1) / (2 - lam)
      }
    val slog = xs.map(x => math.signum(x) * math.log1p(math.abs(x))).sum
    val n = xs.length
    var bestLam = lo
    var bestLl = Double.NegativeInfinity
    var lam = lo
    while (lam <= hi) {
      val t = xs.map(psi(_, lam))
      val m = t.sum / n
      val v = t.map(ti => (ti - m) * (ti - m)).sum / n
      val ll = -0.5 * n * math.log(v) + (lam - 1) * slog
      if (ll > bestLl) { bestLl = ll; bestLam = lam }
      lam += 0.001
    }
    bestLam
  }

  test("grid-zoom lambda matches exact driver-side maximization") {
    val rng = new scala.util.Random(5)
    // right-skewed positive data (lognormal-ish) and symmetric data
    val skewed = Array.fill(4000)(math.exp(rng.nextGaussian()) - 1.0)
    val normal = Array.fill(4000)(rng.nextGaussian() * 2.0 + 1.0)
    val df = skewed.zip(normal).toSeq.toDF("a", "b").repartition(4).cache()
    val m = YeoJohnson.fit(df, Seq("a", "b"), standardize = false)
    val wantA = bruteForceLambda(skewed)
    val wantB = bruteForceLambda(normal)
    assert(math.abs(m.lambdas(0) - wantA) < 0.02, s"a: got ${m.lambdas(0)} want $wantA")
    assert(math.abs(m.lambdas(1) - wantB) < 0.02, s"b: got ${m.lambdas(1)} want $wantB")
    // right-skewed data wants a shrinking lambda (< 1); normal stays near 1
    assert(m.lambdas(0) < 0.5, s"skewed lambda ${m.lambdas(0)}")
    assert(math.abs(m.lambdas(1) - 1.0) < 0.2, s"normal lambda ${m.lambdas(1)}")
  }

  test("standardized transform has zero mean, unit variance, reduced skew") {
    val rng = new scala.util.Random(9)
    val skewed = Array.fill(3000)(math.exp(rng.nextGaussian() * 1.2))
    val df = skewed.toSeq.toDF("x").repartition(4).cache()
    val (out, model) = YeoJohnson.fitTransform(df, Seq("x"))
    val r = out.agg(avg("x"), stddev_pop("x"), skewness("x")).collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-6)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
    val skewBefore = df.agg(skewness("x")).collect()(0).getDouble(0)
    assert(math.abs(r.getDouble(2)) < math.abs(skewBefore) * 0.2,
      s"skew before=$skewBefore after=${r.getDouble(2)}")
    // model round-trips through transform on fresh data deterministically
    val again = model.transform(df).agg(avg("x")).collect()(0).getDouble(0)
    assert(math.abs(again - r.getDouble(0)) < 1e-12)
  }

  test("AutoFeatLight powerTransform path produces standardized features") {
    val rng = new scala.util.Random(3)
    val rows = Seq.fill(800)((math.exp(rng.nextGaussian()), rng.nextDouble() * 10.0 + 1.0))
    val df = rows.toDF("u", "v")
    val (out, model) = graft.model.AutoFeatLight(powerTransform = true).fitTransform(df)
    assert(model.power.nonEmpty)
    val feats = model.features
    val stats = feats.map(c => out.agg(avg(col(s"`$c`")), stddev_pop(col(s"`$c`"))).collect()(0))
    stats.foreach { r =>
      assert(math.abs(r.getDouble(0)) < 1e-6)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
    }
    // serving path reproduces fit output
    val served = model.transform(df)
    assert(served.columns.toSeq == out.columns.toSeq)
  }
}
