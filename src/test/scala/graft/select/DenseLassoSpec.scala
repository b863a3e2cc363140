package graft.select

import graft.SparkSpec
import graft.stats.Gram
import org.apache.spark.sql.functions._

class DenseLassoSpec extends SparkSpec {
  import spark.implicits._

  test("dense driver solver agrees with the distributed Gram solver") {
    val rng = new scala.util.Random(13)
    val n = 1200; val d = 15
    val data = Array.fill(n)(Array.fill(d)(rng.nextGaussian()))
    val ys = data.map(x => 2.5 * x(2) - 1.5 * x(9) + rng.nextGaussian() * 0.1)

    // Gram path
    val df = data.zip(ys).toSeq
      .map { case (x, y) => (x.toSeq, y) }
      .toDF("xs", "y")
      .select((0 until d).map(i => col("xs").getItem(i).as(s"x$i")) :+ col("y"): _*)
      .withColumn("fold", pmod(monotonically_increasing_id(), lit(5)).cast("int"))
      .repartition(4)
    val grams = Gram.compute(df, (0 until d).map(i => s"x$i"), Some("y"), Some("fold"), 5)
    val gFit = new GramLasso(grams).cvFit((0 until d).toArray)

    // dense path on the same rows (different fold layout is fine — both must
    // recover the same sparse truth with close coefficients)
    val xCols = Array.tabulate(d)(j => data.map(_(j)))
    val dense = new DenseLasso(xCols, ys, Array.fill(n)(1.0), Array.tabulate(n)(_ % 5), 5)
    val dFit = dense.cvFit((0 until d).toArray)

    def active(f: LassoFit) = f.coef.zipWithIndex.filter(c => math.abs(c._1) > 1e-2).map(_._2).toSet
    assert(active(dFit).contains(2) && active(dFit).contains(9), s"dense=${active(dFit)}")
    assert(math.abs(dFit.coef(2) - 2.5) < 0.05, s"${dFit.coef(2)}")
    assert(math.abs(dFit.coef(9) + 1.5) < 0.05, s"${dFit.coef(9)}")
    assert(math.abs(dFit.coef(2) - gFit.coef(2)) < 0.02)
    assert(math.abs(dFit.coef(9) - gFit.coef(9)) < 0.02)
    assert(math.abs(dFit.intercept - gFit.intercept) < 0.02)
  }

  test("weighted dense fit honors observation weights") {
    val rng = new scala.util.Random(23)
    val n = 2000
    // two regimes: rows 0..999 follow beta=+2, rows 1000.. follow beta=-2;
    // weighting regime A 9:1 must pull the fit toward +2
    val xs = Array.fill(n)(rng.nextGaussian())
    val ys = xs.zipWithIndex.map { case (x, i) => (if (i < 1000) 2.0 else -2.0) * x + rng.nextGaussian() * 0.05 }
    val w = Array.tabulate(n)(i => if (i < 1000) 9.0 else 1.0)
    val fit = new DenseLasso(Array(xs), ys, w, Array.tabulate(n)(_ % 5), 5)
      .cvFit(Array(0))
    assert(fit.coef(0) > 1.0, s"weighted coef ${fit.coef(0)}")
  }
}
