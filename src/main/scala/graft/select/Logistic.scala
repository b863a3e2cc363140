package graft.select

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed binary logistic regression via Newton-IRLS: each iteration is
  * ONE treeAggregate computing the gradient X'(y-p) and Hessian X'WX with
  * the current coefficients broadcast in the task closure (d is the small
  * post-selection feature count, so the d² buffer is tiny). Supports
  * sklearn-style "balanced" class weights (reference final classifier,
  * autofeat.py:398: LogisticRegressionCV(class_weight="balanced")) and an
  * L2 ridge for conditioning.
  */
object Logistic {

  final case class Model(cols: Seq[String], coef: Array[Double], intercept: Double) {
    def marginCol: org.apache.spark.sql.Column = {
      val terms = cols.zip(coef).map { case (c, b) =>
        col(s"`${c.replace("`", "``")}`").cast("double") * lit(b)
      }
      terms.foldLeft(lit(intercept).cast("double"))(_ + _)
    }
    def probCol: org.apache.spark.sql.Column = lit(1.0) / (lit(1.0) + exp(-marginCol))
    def predictCol: org.apache.spark.sql.Column = (probCol > 0.5).cast("int")
  }

  /** Fit on `df` with double feature columns and a 0/1 label column. */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          balanced: Boolean = true, l2: Double = 1e-6, iters: Int = 12): Model = {
    val d = featureCols.size + 1 // + intercept
    val data = df.select((labelCol +: featureCols)
      .map(c => col(s"`${c.replace("`", "``")}`").cast("double")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = data.agg(count(lit(1)),
      sum(col(s"`${labelCol.replace("`", "``")}`").cast("double"))).collect()(0)
    val n = counts.getLong(0).toDouble
    val nPos = counts.getDouble(1)
    val (w0, w1) =
      if (!balanced) (1.0, 1.0)
      else (n / (2.0 * (n - nPos)), n / (2.0 * nPos)) // n/(k*n_c)

    var beta = new Array[Double](d) // [intercept, coefs...]
    for (_ <- 0 until iters) {
      val b = beta
      // InternalRow pass (toRdd, not .rdd): the cached frame is read through
      // InMemoryTableScan without the deserializer boxing every double —
      // this loop runs `iters` times over the FULL table for the final model
      val buffers = data.queryExecution.toRdd.mapPartitions { rows =>
        val g = new Array[Double](d)
        val h = Array.ofDim[Double](d, d)
        val x = new Array[Double](d)
        rows.foreach { r =>
          var ok = !r.isNullAt(0)
          val y = if (ok) r.getDouble(0) else 0.0
          x(0) = 1.0
          var i = 1
          while (i < d && ok) {
            if (r.isNullAt(i)) ok = false
            else { x(i) = r.getDouble(i); if (x(i).isNaN) ok = false }
            i += 1
          }
          if (ok) {
            var m = 0.0
            i = 0
            while (i < d) { m += b(i) * x(i); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-m))
            val w = if (y > 0.5) w1 else w0
            val gscale = w * (y - p)
            val hscale = w * p * (1.0 - p)
            i = 0
            while (i < d) {
              g(i) += gscale * x(i)
              var j = 0
              while (j < d) { h(i)(j) += hscale * x(i) * x(j); j += 1 }
              i += 1
            }
          }
        }
        Iterator.single((g, h))
      }
      // ordered merge (not treeReduce): deterministic double-sum order
      val (grad, hess) = graft.stats.DetReduce.orderedReduce[(Array[Double], Array[Array[Double]])](
        buffers,
        { case ((g1, h1), (g2, h2)) =>
          var i = 0
          while (i < d) {
            g1(i) += g2(i)
            var j = 0
            while (j < d) { h1(i)(j) += h2(i)(j); j += 1 }
            i += 1
          }
          (g1, h1)
        },
        (new Array[Double](d), Array.ofDim[Double](d, d)))
      // ridge on non-intercept terms; solve H delta = grad - l2*beta
      var i = 1
      while (i < d) { grad(i) -= l2 * beta(i); hess(i)(i) += l2; i += 1 }
      hess(0)(0) += 1e-12
      beta = beta.zip(solve(hess, grad)).map { case (bv, dv) => bv + dv }
    }
    data.unpersist()
    Model(featureCols, beta.drop(1), beta(0))
  }

  /** Gaussian elimination with partial pivoting (d is tiny). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val d = b0.length
    val a = a0.map(_.clone)
    val b = b0.clone
    for (c <- 0 until d) {
      var piv = c
      for (r <- c + 1 until d) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      val t = a(c); a(c) = a(piv); a(piv) = t
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      val p = a(c)(c)
      if (math.abs(p) > 1e-300) {
        for (r <- c + 1 until d) {
          val f = a(r)(c) / p
          if (f != 0.0) {
            for (k <- c until d) a(r)(k) -= f * a(c)(k)
            b(r) -= f * b(c)
          }
        }
      }
    }
    val x = new Array[Double](d)
    for (c <- d - 1 to 0 by -1) {
      var s = b(c)
      for (k <- c + 1 until d) s -= a(c)(k) * x(k)
      x(c) = if (math.abs(a(c)(c)) > 1e-300) s / a(c)(c) else 0.0
    }
    x
  }
}
