package graft.select

import graft.SparkSpec
import graft.stats.Gram
import org.apache.spark.sql.functions._

/** Exact LARS-lasso path on Grams: every knot must satisfy the lasso KKT
  * conditions (the defining property of path exactness), the CV fit must
  * recover planted sparse truth, and the `solver = "lars"` flag must select
  * the same feature SET as coordinate descent on the reference fixture
  * (SURVEY §7.4.2 parity target).
  */
class GramLarsSpec extends SparkSpec {
  import spark.implicits._

  private def regData(n: Int, d: Int, seed: Long, corr01: Double = 0.0) = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n) {
      val x = Array.fill(d)(rng.nextGaussian())
      if (corr01 > 0.0) x(1) = corr01 * x(0) + math.sqrt(1 - corr01 * corr01) * x(1)
      val y = 3.0 * x(0) - 2.0 * x(3) + rng.nextGaussian() * 0.1
      (x.toSeq, y)
    }
  }

  private def toDf(rows: Seq[(Seq[Double], Double)], d: Int) =
    rows.map { case (x, y) => (x, y) }.toDF("xs", "y")
      .select((0 until d).map(i => col("xs")(i).as(s"x$i")) :+ col("y"): _*)

  private def foldGrams(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val withFold = df.repartition(4)
      .withColumn("fold", pmod(monotonically_increasing_id(), lit(5)).cast("int"))
    Gram.compute(withFold, (0 until d).map(i => s"x$i"), Some("y"), Some("fold"), 5)
  }

  test("every path knot satisfies the lasso KKT conditions exactly") {
    val d = 8
    val grams = foldGrams(toDf(regData(1500, d, seed = 5), d), d)
    val lars = new GramLars(grams)
    val total = Gram.total(grams)
    val (gm, c, _, _) = GramOps.centered(total, (0 until d).toArray)
    val path = lars.larsPath(gm, c, activeCap = d, alphaMin = 1e-4)
    assert(path.size >= 3, s"path too short: ${path.size} knots")
    path.foreach { case (lam, beta) =>
      // rho = c - G beta ; KKT: |rho_j| <= lam (inactive), rho_j = lam*sign(beta_j) (active)
      val rho = Array.tabulate(d)(j => c(j) - (0 until d).map(i => gm(j)(i) * beta(i)).sum)
      (0 until d).foreach { j =>
        if (beta(j) == 0.0)
          assert(math.abs(rho(j)) <= lam + 1e-8, s"KKT inactive violated at λ=$lam j=$j: ${rho(j)}")
        else
          assert(math.abs(rho(j) - lam * math.signum(beta(j))) < 1e-8,
            s"KKT active violated at λ=$lam j=$j: rho=${rho(j)} beta=${beta(j)}")
      }
    }
  }

  test("CV LARS recovers the planted sparse truth") {
    val d = 10
    val grams = foldGrams(toDf(regData(2000, d, seed = 9), d), d)
    val fit = new GramLars(grams).cvFit((0 until d).toArray)
    val active = fit.coef.zipWithIndex.filter(c => math.abs(c._1) > 0.05).map(_._2).toSet
    assert(active.contains(0) && active.contains(3), s"active=$active")
    assert(math.abs(fit.coef(0) - 3.0) < 0.15, fit.coef.mkString(","))
    assert(math.abs(fit.coef(3) + 2.0) < 0.15)
  }

  test("solver=lars selects the same SET as CD on the reference fixture") {
    val fixture = getClass.getResource("/fixtures/f3_input.parquet").getPath
    val df = spark.read.parquet(fixture).cache()
    val cols = (0 until 7).map(i => s"c$i")
    val cd = FeatSel.selectFeatures(df, cols, "target")
    val lars = FeatSel.selectFeatures(df, cols, "target", FeatSel.Config(solver = "lars"))
    assert(lars.toSet == cd.toSet, s"lars=$lars cd=$cd")
    assert(lars.toSet == Set("c0", "c5", "c6"), s"lars=$lars")
  }

  test("correlated design: LARS stays sparse and keeps a truth column") {
    // x1 = 0.95 x0 + noise — the regime where CD's grid path and the exact
    // LARS path are known to disagree on entry order
    val d = 6
    val df = toDf(regData(2500, d, seed = 21, corr01 = 0.95), d).cache()
    val cols = (0 until d).map(i => s"x$i")
    val lars = FeatSel.selectFeatures(df, cols, "y", FeatSel.Config(solver = "lars"))
    val cd = FeatSel.selectFeatures(df, cols, "y")
    info(s"lars=$lars cd=$cd")
    // the x0/x1 pair is interchangeable up to the 0.9 correlation filter;
    // the planted non-correlated column must survive in both, and neither
    // solver may admit pure-noise columns
    assert(lars.contains("x3") && cd.contains("x3"))
    assert(lars.toSet.subsetOf(Set("x0", "x1", "x3")), s"lars=$lars")
  }
}
