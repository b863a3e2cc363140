package graft.select

import graft.stats.Gram

/** Driver-side L1 (Lasso) solver on pre-aggregated per-fold Grams —
  * the distributed counterpart of the reference's LassoLarsCV(cv=5)
  * (featsel.py:66,110,147): one treeAggregate pass computes the k fold
  * Grams; all subsequent fits over arbitrary column subsets are pure
  * driver-side coordinate descent on Gram submatrices (no further cluster
  * work). Model selection: CV MSE over a 100-point geometric λ path
  * (coordinate descent approximates the exact LARS path; parity target is
  * the SELECTED SET, not coefficient paths — SURVEY.md §7.4.2).
  */
final class GramLasso(folds: Array[Gram]) {
  private val k = folds.length
  private val total: Gram = Gram.total(folds)
  val n: Long = total.n

  final case class Fit(coef: Array[Double], intercept: Double, alpha: Double)

  /** Coordinate descent at one λ on centered (G=XᵀX/n−μμᵀ, c=Xᵀy/n−μμy). */
  private def cd(gram: Array[Array[Double]], c: Array[Double], lambda: Double,
                 beta: Array[Double], maxIter: Int = 1000, tol: Double = 1e-8): Unit = {
    val d = c.length
    var it = 0
    var maxDelta = Double.MaxValue
    while (it < maxIter && maxDelta > tol) {
      maxDelta = 0.0
      var j = 0
      while (j < d) {
        val gjj = gram(j)(j)
        if (gjj > 0) {
          var rho = c(j)
          var kk = 0
          val gj = gram(j)
          while (kk < d) { if (kk != j) rho -= gj(kk) * beta(kk); kk += 1 }
          val bNew =
            if (rho > lambda) (rho - lambda) / gjj
            else if (rho < -lambda) (rho + lambda) / gjj
            else 0.0
          val delta = math.abs(bNew - beta(j)) * math.sqrt(gjj)
          if (delta > maxDelta) maxDelta = delta
          beta(j) = bNew
        }
        j += 1
      }
      it += 1
    }
  }

  private def centered(g: Gram, idx: Array[Int]): (Array[Array[Double]], Array[Double], Array[Double], Double) = {
    val d = idx.length
    val nn = g.n.toDouble
    val mu = idx.map(i => g.sx(i) / nn)
    val muY = g.sy / nn
    val gm = Array.ofDim[Double](d, d)
    val c = new Array[Double](d)
    var i = 0
    while (i < d) {
      c(i) = g.sxy(idx(i)) / nn - mu(i) * muY
      var j = 0
      while (j < d) {
        gm(i)(j) = g.xx(idx(i), idx(j)) / nn - mu(i) * mu(j)
        j += 1
      }
      i += 1
    }
    (gm, c, mu, muY)
  }

  private def minus(a: Gram, b: Gram): Gram = {
    val g = new Gram(a.d)
    g.n = a.n - b.n
    var i = 0
    while (i < a.d) { g.sx(i) = a.sx(i) - b.sx(i); g.sxy(i) = a.sxy(i) - b.sxy(i); i += 1 }
    i = 0
    while (i < a.sxx.length) { g.sxx(i) = a.sxx(i) - b.sxx(i); i += 1 }
    g.sy = a.sy - b.sy; g.syy = a.syy - b.syy
    g
  }

  /** Held-out MSE of (beta, intercept over train means) on fold Gram. */
  private def foldMse(fold: Gram, idx: Array[Int], beta: Array[Double],
                      muTrain: Array[Double], muYTrain: Double): Double = {
    val nf = fold.n.toDouble
    if (nf == 0) return Double.NaN
    val b0 = muYTrain - dot(muTrain, beta)
    // E[(y - Xb - b0)^2] over fold, from raw sums
    var quad = 0.0
    var i = 0
    while (i < idx.length) {
      var j = 0
      while (j < idx.length) { quad += beta(i) * beta(j) * fold.xx(idx(i), idx(j)); j += 1 }
      i += 1
    }
    var lin = 0.0
    var sxb = 0.0
    i = 0
    while (i < idx.length) { lin += beta(i) * fold.sxy(idx(i)); sxb += beta(i) * fold.sx(idx(i)); i += 1 }
    (fold.syy - 2.0 * lin + quad - 2.0 * b0 * fold.sy + 2.0 * b0 * sxb + nf * b0 * b0) / nf
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cross-validated Lasso fit over the column subset `idx`. */
  def cvFit(idx: Array[Int], nAlphas: Int = 100, eps: Double = 1e-3): Fit = {
    val d = idx.length
    require(d > 0, "empty column subset")
    // λ path from the full training data
    val (_, cFull, _, _) = centered(total, idx)
    val alphaMax = math.max(cFull.map(math.abs).max, 1e-12)
    val alphas = (0 until nAlphas).map(i =>
      alphaMax * math.pow(eps, i.toDouble / (nAlphas - 1))).toArray
    // per-fold CD paths with warm starts
    val cvMse = Array.fill(nAlphas)(0.0)
    val cvCnt = Array.fill(nAlphas)(0)
    var f = 0
    while (f < k) {
      val fold = folds(f)
      if (fold.n > 0 && total.n - fold.n > 1) {
        val train = minus(total, fold)
        val (gm, c, mu, muY) = centered(train, idx)
        val beta = new Array[Double](d)
        var a = 0
        while (a < nAlphas) {
          cd(gm, c, alphas(a), beta)
          cvMse(a) += foldMse(fold, idx, beta, mu, muY)
          cvCnt(a) += 1
          a += 1
        }
      }
      f += 1
    }
    var best = 0
    var bestMse = Double.MaxValue
    var a = 0
    while (a < nAlphas) {
      if (cvCnt(a) > 0) {
        val m = cvMse(a) / cvCnt(a)
        if (m < bestMse - 1e-15) { bestMse = m; best = a }
      }
      a += 1
    }
    // refit on all data at the selected λ
    val (gm, c, mu, muY) = centered(total, idx)
    val beta = new Array[Double](d)
    // warm path down to best for stability
    a = 0
    while (a <= best) { cd(gm, c, alphas(a), beta); a += 1 }
    Fit(beta, muY - dot(mu, beta), alphas(best))
  }
}
