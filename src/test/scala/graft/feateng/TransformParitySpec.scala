package graft.feateng

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Serving-path numeric parity at the north rule's tolerance: the reference
  * regenerates selected features at transform time in FLOAT64
  * (autofeat.py:176-242, lambdify on raw columns); our serving projection
  * (Compile.toColumnNanMasked — the same path AutoFeat.transform uses) must
  * be allclose at rtol 1e-5 against that float64 golden
  * (tools/gen_transform_golden.py, generated from the reference itself).
  */
class TransformParitySpec extends SparkSpec {

  private def fixture(name: String) =
    getClass.getResource(s"/fixtures/$name").getPath

  test("float64 serving regeneration is allclose (rtol 1e-5) vs the reference") {
    val input = spark.read.parquet(fixture("f2_input.parquet"))
    val golden = spark.read.parquet(fixture("f2_steps2_float64_golden.parquet"))
    val gCols = golden.columns.filter(_ != "row_id").toSeq

    // reproduce the engineered pool on the fixture, then regenerate each
    // formula the way model.transform does (float64, NaN row-masking)
    val eng = new FeatEng(FeatEngConfig(maxSteps = 2))
      .engineerFeatures(input.select("x1", "x2", "x3"), Seq("x1", "x2", "x3"))
    assert(eng.newCols.toSet == gCols.toSet,
      s"pool mismatch: ours=${eng.newCols.size} golden=${gCols.size} " +
        s"onlyOurs=${eng.newCols.toSet -- gCols.toSet} onlyGolden=${gCols.toSet -- eng.newCols.toSet}")

    import graft.expr.Compile
    val ours = input.select(col("row_id") +: eng.newCols.zipWithIndex.map { case (n, i) =>
      Compile.toColumnNanMasked(eng.pool(n), s => col(s).cast("double")).as(s"o_$i")
    }: _*)
    val joined = ours.join(golden, "row_id")
    val checks = eng.newCols.zipWithIndex.map { case (n, i) =>
      val a = col(s"o_$i")
      val b = col(s"`$n`")
      // allclose(a, b, rtol=1e-5, atol=1e-8): max over rows of the excess
      max(abs(a - b) - (lit(1e-8) + lit(1e-5) * abs(b))).as(s"e_$i")
    }
    val r = joined.agg(checks.head, checks.tail: _*).collect()(0)
    eng.newCols.zipWithIndex.foreach { case (n, i) =>
      val excess = r.getDouble(i)
      assert(excess <= 0.0, s"column '$n' violates allclose by $excess")
    }
    info(s"${eng.newCols.size} serving-path columns allclose at rtol 1e-5")
  }
}
