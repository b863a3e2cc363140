package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-partition PCA moment buffer. TOP-LEVEL class on purpose: an inner
  * class would capture `$outer` and ship it with every task result (the
  * 1.9 GiB maxResultSize incident — see FeatEng.WaveAcc).
  */
private[pipeline] final class PcaAcc(val dim: Int) extends Serializable {
  var n: Long = 0L
  val sum = new Array[Double](dim)
  val ss = new Array[Double](dim * (dim + 1) / 2) // upper triangle, row-major

  def add(v: Array[Double]): Unit = {
    n += 1
    var i = 0
    var p = 0
    while (i < dim) {
      val vi = v(i)
      sum(i) += vi
      var j = i
      while (j < dim) { ss(p) += vi * v(j); j += 1; p += 1 }
      i += 1
    }
  }

  def merge(o: PcaAcc): PcaAcc = {
    n += o.n
    var i = 0
    while (i < dim) { sum(i) += o.sum(i); i += 1 }
    i = 0
    while (i < ss.length) { ss(i) += o.ss(i); i += 1 }
    this
  }
}

/** Fitted PCA: `components(j)` is the j-th principal axis (unit length,
  * eigenvalue-descending, deterministic sign: the largest-|entry|
  * coordinate is positive), `eigenvalues(j)` its variance.
  */
final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                          eigenvalues: Array[Double]) {
  def dim: Int = mean.length
  def k: Int = components.length
}

/** Distributed principal component analysis over an embedding column —
  * the data-DEPENDENT complement to the oblivious
  * [[Similarity.rpProject]]: decorrelate/whiten/compress embeddings
  * before IVF training or brute scoring.
  *
  * Scale shape: training is ONE pass over the corpus accumulating
  * (n, sum, upper-triangular scatter) per partition — O(dim^2/2) doubles
  * of state, merged in deterministic partition order through
  * [[graft.stats.DetReduce]] (bit-reproducible under any scheduling) —
  * plus an O(dim^3) driver-side Jacobi eigensolve (dim is the EMBEDDING
  * width, hundreds at most; the 10^12 rows never see it). Projection is
  * the codegen'd [[graft.functions.MatProject]] map stage (mean and
  * component matrix as reference objects).
  */
object Pca {

  def train(df: DataFrame, vecCol: String, k: Int, dim: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    // backtick-quote: user column names may contain dots/spaces (the
    // Gram.compute rule); non-finite elements sanitize to 0 like
    // RpProject/MatProject — one NaN element must not poison the model
    val rows = df.select(col(s"`${vecCol.replace("`", "``")}`").cast("array<double>"))
      .queryExecution.toRdd
    val buffers = rows.mapPartitions { it =>
      val acc = new PcaAcc(dim)
      val v = new Array[Double](dim)
      it.foreach { row =>
        if (!row.isNullAt(0)) {
          val a = row.getArray(0)
          val m = math.min(a.numElements(), dim)
          java.util.Arrays.fill(v, 0.0)
          var i = 0
          while (i < m) {
            if (!a.isNullAt(i)) {
              val x = a.getDouble(i)
              if (java.lang.Double.isFinite(x)) v(i) = x
            }
            i += 1
          }
          acc.add(v)
        }
      }
      Iterator.single(acc)
    }
    val acc = graft.stats.DetReduce.orderedReduce[PcaAcc](
      buffers, (a, b) => a.merge(b), new PcaAcc(dim))
    require(acc.n >= 2, s"PCA needs at least 2 vectors, got ${acc.n}")
    val n = acc.n.toDouble
    val mean = acc.sum.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var p = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = acc.ss(p) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; p += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // order by (eigenvalue desc, original index asc); canonical sign
    val order = values.indices.sortBy(idx => (-values(idx), idx)).take(k)
    val comps = order.map { idx =>
      val v = vectors.map(_(idx)) // column idx = eigenvector
      var best = 0
      var bi = 1
      while (bi < v.length) { if (math.abs(v(bi)) > math.abs(v(best))) best = bi; bi += 1 }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(values(_)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in place on a
    * copy). Returns (eigenvalues, eigenvector matrix with eigenvectors as
    * COLUMNS). Deterministic: fixed sweep order, fixed convergence
    * threshold.
    */
  private[pipeline] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = {
      var s = 0.0
      var i = 0
      while (i < d) { s += m(i)(i) * m(i)(i); i += 1 }
      // floor at the smallest positive double, NOT 1.0: a small-norm
      // covariance (tiny-magnitude embeddings) would otherwise turn the
      // relative threshold absolute and exit before any rotation
      math.max(java.lang.Double.MIN_VALUE, math.sqrt(s))
    }
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-13 * scale && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // smaller-magnitude root of t^2 + 2*theta*t - 1 = 0; the
            // signum form returns 0 at theta == 0 (equal diagonal), which
            // would skip the required 45-degree rotation forever
            val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                    else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Centered projection onto the model's components: array<double> of
    * length k, through the codegen'd native expression.
    */
  def project(vec: Column, model: PcaModel): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.MatProject(bridge.expression(vec),
      model.mean, model.components.flatten, model.k, model.dim))
  }

  /** Persist as one parquet table (row j = component j with its
    * eigenvalue; the mean rides on every row) — exact double round-trip,
    * loadable in a fresh session without refitting.
    */
  def save(model: PcaModel, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    model.components.indices.map(j =>
        (j, model.components(j).toSeq, model.eigenvalues(j), model.mean.toSeq))
      .toDF("j", "component", "eigenvalue", "mean")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(path: String): PcaModel = {
    val spark = org.apache.spark.sql.SparkSession.active
    val rows = spark.read.parquet(path).orderBy("j").collect()
    require(rows.nonEmpty, s"empty PCA model at $path")
    PcaModel(rows(0).getSeq[Double](3).toArray,
      rows.map(_.getSeq[Double](1).toArray),
      rows.map(_.getDouble(2)))
  }
}
