package graft.select

import graft.SparkSpec

class LogisticLassoSpec extends SparkSpec {
  import spark.implicits._

  private def logisticData(n: Int, d: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n) {
      val x = Array.fill(d)(rng.nextGaussian())
      val m = 2.5 * x(1) - 2.0 * x(4) + 1.5 * x(7)
      val p = 1.0 / (1.0 + math.exp(-m))
      val y = if (rng.nextDouble() < p) 1.0 else 0.0
      (x.toSeq, y)
    }
  }

  test("proximal-Newton L1 logistic recovers the sparse truth") {
    val d = 10
    val df = logisticData(3000, d, seed = 11)
      .map { case (x, y) => (x(0), x(1), x(2), x(3), x(4), x(5), x(6), x(7), x(8), x(9), y) }
      .toDF((0 until d).map(i => s"x$i") :+ "y": _*)
      .repartition(4).cache()
    val cols = (0 until d).map(i => s"x$i")
    val fit = LogisticLasso.cvFit(df, cols, "y", rounds = 3)
    // CV lambda is prediction-optimal, not sparsity-optimal (like sklearn's
    // LogisticRegressionCV): small noise coefficients can survive — the
    // planted signal must dominate them by a wide margin
    val active = fit.coef.zipWithIndex.filter(c => math.abs(c._1) > 0.3).map(_._2).toSet
    assert(active == Set(1, 4, 7), s"active=$active coef=${fit.coef.mkString(",")}")
    val noiseMax = fit.coef.zipWithIndex.collect { case (c, i) if !Set(1, 4, 7)(i) => math.abs(c) }.max
    assert(Seq(1, 4, 7).forall(i => math.abs(fit.coef(i)) > 5 * noiseMax))
    // signs must match the truth
    assert(fit.coef(1) > 0 && fit.coef(4) < 0 && fit.coef(7) > 0)
    // rounds > 1 moves the solution toward the true logistic optimum:
    // coefficient magnitudes grow past the round-0 quadratic's shrunk values
    val fit0 = LogisticLasso.cvFit(df, cols, "y", rounds = 1)
    assert(math.abs(fit.coef(1)) > math.abs(fit0.coef(1)) * 0.9)
  }

  test("classification feature selection recovers planted columns") {
    val d = 8
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(1500) {
      val x = Array.fill(d)(rng.nextGaussian())
      val m = 3.0 * x(0) - 2.5 * x(3)
      val p = 1.0 / (1.0 + math.exp(-m))
      val y = if (rng.nextDouble() < p) 1.0 else 0.0
      (x(0), x(1), x(2), x(3), x(4), x(5), x(6), x(7), y)
    }
    val df = rows.toDF((0 until d).map(i => s"x$i") :+ "y": _*).repartition(4).cache()
    val good = FeatSel.selectFeatures(df, (0 until d).map(i => s"x$i"), "y",
      FeatSel.Config(problemType = "classification"))
    assert(good.contains("x0") && good.contains("x3"), s"selected $good")
    assert(good.size <= 4, s"too many false positives: $good")
  }

  test("selectionNewtonRounds: far-from-origin fixture converges; default surrogate unchanged") {
    // heavy class imbalance (intercept -2.5 => ~11% positives): the one-step
    // quadratic expands around beta=0 where the intercept is badly wrong —
    // the regime the Newton rounds exist for
    val d = 6
    val rng = new scala.util.Random(23)
    val rows = Seq.fill(2500) {
      val x = Array.fill(d)(rng.nextGaussian())
      val m = -2.5 + 3.0 * x(1) - 2.5 * x(4)
      val y = if (rng.nextDouble() < 1.0 / (1.0 + math.exp(-m))) 1.0 else 0.0
      (x(0), x(1), x(2), x(3), x(4), x(5), y)
    }
    val df = rows.toDF((0 until d).map(i => s"x$i") :+ "y": _*).repartition(4).cache()
    val cols = (0 until d).map(i => s"x$i")
    val surrogate = FeatSel.selectFeatures(df, cols, "y",
      FeatSel.Config(problemType = "classification"))
    val newton = FeatSel.selectFeatures(df, cols, "y",
      FeatSel.Config(problemType = "classification", selectionNewtonRounds = 3))
    info(s"surrogate=$surrogate newton=$newton")
    // converged selection finds the planted pair without drowning in noise
    assert(newton.contains("x1") && newton.contains("x4"), s"selected $newton")
    assert(newton.size <= 4, s"too many false positives: $newton")
    // the default surrogate must also recover the pair (rounds=1 is the
    // same code path — no Newton wrapper is constructed). NOTE: exact
    // set equality between repeated runs is NOT asserted on this fixture:
    // it is deliberately knife-edge (pure-noise columns at the coefficient
    // threshold), where treeAggregate's task-completion combine order flips
    // double-summation at FP epsilon and can admit/drop one noise column.
    assert(surrogate.contains("x1") && surrogate.contains("x4"), s"selected $surrogate")
    assert(surrogate.size <= 4, s"too many false positives: $surrogate")
  }
}
