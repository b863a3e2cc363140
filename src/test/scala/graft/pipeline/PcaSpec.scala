package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed PCA: hand-checkable 2-d geometry, eigensolver sanity,
  * orthonormality + variance bookkeeping on the embeddings fixture,
  * projection-expression parity, and partitioning determinism.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobi eigensolver matches a hand-solved symmetric 2x2") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; eigenvectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-12)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12) // same sign, equal magnitude
  }

  test("2-d cloud along (0.6, 0.8): first component recovered, sign canonical") {
    val rng = new scala.util.Random(7)
    val pts = (0 until 2000).map { _ =>
      val t = rng.nextGaussian() * 5.0
      val o = rng.nextGaussian() * 0.1
      (Seq(0.6 * t - 0.8 * o + 10.0, 0.8 * t + 0.6 * o - 3.0))
    }
    val m = Pca.train(pts.toDF("v"), "v", k = 2, dim = 2)
    assert(math.abs(m.mean(0) - 10.0) < 0.5 && math.abs(m.mean(1) + 3.0) < 0.5)
    // canonical sign: largest-|entry| coordinate positive -> (0.6, 0.8)
    assert(math.abs(m.components(0)(0) - 0.6) < 0.02, m.components(0).toSeq.toString)
    assert(math.abs(m.components(0)(1) - 0.8) < 0.02)
    assert(m.eigenvalues(0) > 20.0 && m.eigenvalues(1) < 0.05)
  }

  test("fixture embeddings: orthonormal components, eigenvalue bookkeeping") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val m = Pca.train(e, "embedding", k = 8, dim = 64)
    // orthonormal
    for (i <- 0 until 8; j <- i until 8) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j) dot=$d")
    }
    // eigenvalues descending and positive
    assert(m.eigenvalues.toSeq === m.eigenvalues.sorted(Ordering[Double].reverse).toSeq)
    assert(m.eigenvalues.last >= 0.0)
    // projected variance of component j equals eigenvalue j (one pass check)
    val proj = e.select(Pca.project(col("embedding"), m).as("y")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = proj.length.toDouble
    for (j <- 0 until 8) {
      val mu = proj.map(_(j)).sum / n
      val va = proj.map(p => (p(j) - mu) * (p(j) - mu)).sum / n
      assert(math.abs(va - m.eigenvalues(j)) < 1e-6 * math.max(1.0, m.eigenvalues(j)),
        s"component $j: var=$va vs lambda=${m.eigenvalues(j)}")
      assert(math.abs(mu) < 1e-9, s"projected mean of component $j = $mu")
    }
  }

  test("projection expression matches a plain-Scala mirror") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 30)
    val m = Pca.train(e, "embedding", k = 4, dim = 64)
    val rows = e.select(col("vec_id"), col("embedding"),
      Pca.project(col("embedding"), m).as("y")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val exp = m.components.map(comp =>
        comp.indices.map(i => comp(i) * (v(i) - m.mean(i))).sum)
      val got = r.getSeq[Double](2).toArray
      exp.zip(got).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("one NaN element cannot poison the model; weird column names work") {
    val clean = (0 until 200).map(i => Seq(i.toDouble, 2.0 * i))
    val dirty = clean.updated(7, Seq(Double.NaN, 14.0)) :+ Seq(Double.PositiveInfinity, 0.0)
    val m = Pca.train(dirty.toDF("emb.v"), "emb.v", k = 2, dim = 2)
    assert(m.eigenvalues.forall(v => java.lang.Double.isFinite(v)))
    assert(m.components.flatten.forall(v => java.lang.Double.isFinite(v)))
    // direction (1, 2)/sqrt(5) still dominates despite the corrupt rows
    assert(math.abs(m.components(0)(1) / m.components(0)(0) - 2.0) < 0.1)
    // serving side sanitizes the same way
    val y = Seq(Seq(Double.NaN, 1.0)).toDF("v")
      .select(Pca.project(col("v"), m).as("y")).collect()(0).getSeq[Double](0)
    assert(y.forall(v => java.lang.Double.isFinite(v)))
  }

  test("parquet save/load round-trips the model bit-exactly") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val m = Pca.train(e, "embedding", k = 5, dim = 64)
    val path = java.nio.file.Files.createTempDirectory("pca_model").toString
    Pca.save(m, path)
    val m2 = Pca.load(path)
    assert(m2.mean.toSeq === m.mean.toSeq)
    assert(m2.eigenvalues.toSeq === m.eigenvalues.toSeq)
    assert(m2.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq)
    // and the loaded model serves identically
    val y1 = e.limit(5).select(Pca.project(col("embedding"), m)).collect().map(_.getSeq[Double](0))
    val y2 = e.limit(5).select(Pca.project(col("embedding"), m2)).collect().map(_.getSeq[Double](0))
    assert(y1.map(_.toSeq).toSeq === y2.map(_.toSeq).toSeq)
  }

  test("training is deterministic for a given partitioning and stable across ones") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val m1 = Pca.train(e.repartition(3, col("vec_id")), "embedding", k = 3, dim = 64)
    val m2 = Pca.train(e.repartition(3, col("vec_id")), "embedding", k = 3, dim = 64)
    val f1: Seq[Double] = m1.components.toSeq.flatMap(_.toSeq)
    val f2: Seq[Double] = m2.components.toSeq.flatMap(_.toSeq)
    assert(f1 === f2) // bit-identical
    val m3 = Pca.train(e.repartition(7, col("vec_id")), "embedding", k = 3, dim = 64)
    val f3: Seq[Double] = m3.components.toSeq.flatMap(_.toSeq)
    f1.zip(f3).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8) // FP fold order differs across layouts
    }
  }
}
