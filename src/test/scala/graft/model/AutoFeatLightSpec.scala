package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AutoFeatLightSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = {
    val rng = new scala.util.Random(11)
    Seq.fill(300)((rng.nextDouble() + 0.5, rng.nextGaussian(), rng.nextDouble() * 3))
      .map { case (a, b, c) => (a, b, c, 2.0 * a, 7.7) } // dup=2a (corr 1), const
      .toDF("a", "b", "c", "dup", "konst")
  }

  test("checkFeatures drops constant and redundant columns") {
    val kept = AutoFeatLight.checkFeatures(df, Seq("a", "b", "c", "dup", "konst"), 0.99999)
    assert(!kept.contains("konst"))
    assert(kept.count(c => c == "a" || c == "dup") == 1) // one of the pair survives
    assert(kept.contains("b") && kept.contains("c"))
  }

  test("ratios and products match row-level math; division by zero -> 0") {
    val small = Seq((2.0, 4.0), (0.0, 5.0), (3.0, 0.0)).toDF("x1", "x2")
    val w = AutoFeatLight.withAdditional(small, Seq("x1", "x2"), ratio = true, product = true)
    assert(w.columns.toSeq == Seq("x1", "x2", "x2 / x1", "x1 / x2", "x1 * x2"))
    val rows = w.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.contains((2.0, 4.0, 2.0, 0.5, 8.0)))
    assert(rows.contains((0.0, 5.0, 0.0, 0.0, 0.0)))   // x2/0 -> 0
    assert(rows.contains((3.0, 0.0, 0.0, 0.0, 0.0)))   // 0/x1 = 0, x1/0 -> 0
  }

  test("fitTransform end-to-end filters, widens, and serves identically") {
    val (out, model) = AutoFeatLight(scale = true).fitTransform(df)
    assert(model.goodColsOrg.size == 3)                     // a|dup collapse + konst gone
    assert(out.columns.length == model.features.size)
    // serving path reproduces the fit output
    val served = model.transform(df)
    val a = out.orderBy(out.columns.map(c => col(s"`$c`")): _*).collect().map(_.toSeq)
    val b = served.orderBy(served.columns.map(c => col(s"`$c`")): _*).collect().map(_.toSeq)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ra, rb) =>
      ra.zip(rb).foreach { case (x: Double, y: Double) => assert(math.abs(x - y) < 1e-12) }
    }
    // scaled columns have unit (biased) std
    val st = graft.stats.Scaling.stats(out, model.features)
    st.stdPop.foreach(s => assert(math.abs(s - 1.0) < 1e-6))
  }
}
