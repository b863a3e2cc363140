package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rademacher random projection: plain-Scala mirror parity (exact
  * integers), JL cosine preservation on the embeddings fixture, kNN
  * integration in projected space, and degenerate inputs.
  */
class RpProjectSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val outDim = 16
  private val seed = 7

  private def mirror(vec: Seq[Float]): Seq[Long] = {
    val qv = vec.take(dim).map(v =>
      if (java.lang.Double.isFinite(v.toDouble)) math.floor(v.toDouble * 1048576.0 + 0.5).toLong
      else 0L)
    (0 until outDim).map { j =>
      qv.zipWithIndex.map { case (q, i) =>
        q * SrpSketch.planeSign(seed, j, i, family = "rp")
      }.sum
    }
  }

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("projection matches the plain-Scala mirror and is integer-exact") {
    val rows = embeddings.filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"),
        graft.pipeline.Similarity.rpProject(col("embedding"), outDim, dim, seed).as("y"))
      .collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val y = r.getSeq[Double](2)
      assert(y.length === outDim)
      assert(y.forall(v => v == math.rint(v)), "values must be exact integers")
      assert(y.map(_.toLong) === mirror(r.getSeq[Float](1)), s"vec ${r.getLong(0)}")
    }
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / math.max(math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum), 1e-12)
  }

  test("JL property: projected cosine tracks original cosine within 1/sqrt(outDim)") {
    val proj = embeddings.select(col("vec_id"), col("embedding"),
        graft.pipeline.Similarity.rpProject(col("embedding"), outDim, dim, seed).as("y"))
      .filter(col("vec_id") < 100).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Double](2).toArray))
    val pairs = for {
      (i1, v1, y1) <- proj; (i2, v2, y2) <- proj if i1 < i2
    } yield (cos(v1, v2), cos(y1, y2))
    val errs = pairs.map { case (a, b) => math.abs(a - b) }
    val mae = errs.sum / errs.length
    // theory: E|err| ~ 1/sqrt(outDim) = 0.25; the fixture measures ~0.19
    assert(mae < 0.25, s"mean |cos_proj - cos_orig| = $mae")
    // and the two cosines correlate positively (measured r ~= 0.44 — the
    // fixture's cosine margins are SMALLER than the JL noise floor at
    // outDim 16, which is why downstream kNN needs margin >> 1/sqrt(k);
    // see the clustered test below)
    val n = pairs.length
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (a, b) => (a - mx) * (b - my) }.sum / n
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum / n)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum / n)
    val r = cov / (sx * sy)
    assert(r > 0.3, s"pearson r = $r")
  }

  test("kNN in projected space is exact when the cosine margin beats the JL noise") {
    // 4 clusters x 10 members, within-cluster cosine ~0.95 vs ~0 across:
    // margin 0.9 >> 1/sqrt(16), so projected top-9 recovers every mate
    import graft.pipeline.Similarity
    val rng = new scala.util.Random(42)
    val cents = Array.fill(4)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val vecs = for (c <- 0 until 4; m <- 0 until 10) yield
      ((c * 10 + m).toLong, cents(c).map(x => x + 0.15f * rng.nextGaussian().toFloat).toSeq)
    val df = vecs.toDF("vec_id", "embedding")
    val projAll = df.select(col("vec_id"),
      Similarity.rpProject(col("embedding"), outDim, dim, seed).as("embedding"))
    val top = Similarity.bruteForceKnn(projAll, projAll, "vec_id", "embedding", 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }
    val recall = vecs.map { case (q, _) =>
      val mates = vecs.map(_._1).filter(i => i != q && i / 10 == q / 10).toSet
      (mates intersect top(q)).size.toDouble / 9.0
    }.sum / vecs.length
    assert(recall >= 0.95, s"clustered recall@9 in projected space = $recall")
  }

  test("degenerate vectors project to all zeros; null vector -> null") {
    val df = Seq(
      (1L, Some(Seq.empty[Float])),
      (2L, None),
      (3L, Some(Seq(Float.NaN, 0.0f)))).toDF("id", "vec")
    val got = df.select(col("id"),
        graft.pipeline.Similarity.rpProject(col("vec"), 4, 2, seed).as("y"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(1L) === Seq(0.0, 0.0, 0.0, 0.0))
    assert(got(2L) === null)
    assert(got(3L) === Seq(0.0, 0.0, 0.0, 0.0))
  }
}
