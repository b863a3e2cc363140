package graft.select

/** Driver-side deterministic CV-lasso used by [[NumpyParity]] — the
  * operation-order twin of `ParityLasso` in
  * tools/gen_featsel_parity_golden.py (which is injected for sklearn's
  * `LassoLarsCV` when the REFERENCE featsel.py generates the parity golden).
  *
  * Both twins are written with identical scalar float64 loops — sequential
  * ascending sums, cyclic coordinate descent on the centered Gram,
  * warm-started along a fixed 40-point geometric λ path, 5 contiguous CV
  * folds — so their coefficient vectors are bit-identical, which makes every
  * downstream threshold comparison in the reference control flow
  * (featsel.py:129-131,86-89) decide identically on both sides.
  *
  * This is deliberately NOT a LARS reimplementation (GramLars is); its job
  * is to be a bit-reproducible stand-in so NumpyParitySpec pins the parts
  * of the reference that ARE mirrorable: RNG draw order, float32 scaling,
  * CPython set/Counter ordering, correlation filtering.
  */
object ParityLasso {

  val KLambdas = 40
  private val CdTol = 1e-12
  private val CdMaxSweeps = 1000

  private def cdSolve(g: Array[Array[Double]], c: Array[Double], l: Double, w: Array[Double]): Unit = {
    val d = c.length
    var sweep = 0
    var go = true
    while (go && sweep < CdMaxSweeps) {
      var maxDelta = 0.0
      var j = 0
      while (j < d) {
        val gjj = g(j)(j)
        var wj = 0.0
        if (gjj > 0.0) {
          var dot = 0.0
          val row = g(j)
          var k = 0
          while (k < d) { dot += row(k) * w(k); k += 1 }
          val rho = c(j) - dot + gjj * w(j)
          if (rho > l) wj = (rho - l) / gjj
          else if (rho < -l) wj = (rho + l) / gjj
          else wj = 0.0
        }
        var delta = wj - w(j)
        if (delta < 0.0) delta = -delta
        if (delta > maxDelta) maxDelta = delta
        w(j) = wj
        j += 1
      }
      sweep += 1
      if (maxDelta <= CdTol) go = false
    }
  }

  private def means(x: Array[Array[Double]], y: Array[Double], rows: Array[Int], d: Int): (Array[Double], Double) = {
    val n = rows.length
    val mx = new Array[Double](d)
    var j = 0
    while (j < d) {
      var s = 0.0
      var r = 0
      while (r < n) { s += x(rows(r))(j); r += 1 }
      mx(j) = s / n
      j += 1
    }
    var s = 0.0
    var r = 0
    while (r < n) { s += y(rows(r)); r += 1 }
    (mx, s / n)
  }

  private def gram(
      x: Array[Array[Double]], y: Array[Double], rows: Array[Int],
      mx: Array[Double], my: Double): (Array[Array[Double]], Array[Double]) = {
    val d = mx.length
    val n = rows.length
    val g = Array.ofDim[Double](d, d)
    val c = new Array[Double](d)
    var j = 0
    while (j < d) {
      var k = j
      while (k < d) {
        var s = 0.0
        var r = 0
        while (r < n) {
          val xi = x(rows(r))
          s += (xi(j) - mx(j)) * (xi(k) - mx(k))
          r += 1
        }
        g(j)(k) = s
        g(k)(j) = s
        k += 1
      }
      var s = 0.0
      var r = 0
      while (r < n) {
        val xi = x(rows(r))
        s += (xi(j) - mx(j)) * (y(rows(r)) - my)
        r += 1
      }
      c(j) = s
      j += 1
    }
    (g, c)
  }

  /** Fit on row-major float64 data; returns `coef_`. */
  def fit(x: Array[Array[Double]], y: Array[Double]): Array[Double] = {
    val n = x.length
    val d = if (n == 0) 0 else x(0).length
    if (d == 0) return new Array[Double](0)
    val nfolds = 5
    val base = n / nfolds
    val extra = n % nfolds
    val bounds = new Array[(Int, Int)](nfolds)
    var start = 0
    var s = 0
    while (s < nfolds) {
      val size = base + (if (s < extra) 1 else 0)
      bounds(s) = (start, start + size)
      start += size
      s += 1
    }
    val allRows = Array.tabulate(n)(identity)
    val (mxFull, myFull) = means(x, y, allRows, d)
    var lamMax = 0.0
    var j = 0
    while (j < d) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += (x(i)(j) - mxFull(j)) * (y(i) - myFull); i += 1 }
      var a = acc / n
      if (a < 0.0) a = -a
      if (a > lamMax) lamMax = a
      j += 1
    }
    if (!(lamMax > 0.0) || lamMax.isNaN || lamMax.isInfinite) return new Array[Double](d)
    // exact-binary ratio (0.75): bit-identical grid across languages
    val lams = new Array[Double](KLambdas)
    lams(0) = lamMax
    var li = 1
    while (li < KLambdas) { lams(li) = lams(li - 1) * 0.75; li += 1 }
    val cvErr = new Array[Double](KLambdas)
    s = 0
    while (s < nfolds) {
      val (lo, hi) = bounds(s)
      val train = allRows.filter(i => i < lo || i >= hi)
      val ntr = train.length
      val (mx, my) = means(x, y, train, d)
      val (g, c) = gram(x, y, train, mx, my)
      val w = new Array[Double](d)
      var t = 0
      while (t < KLambdas) {
        cdSolve(g, c, lams(t) * ntr, w)
        var i = lo
        while (i < hi) {
          var pred = my
          val xi = x(i)
          var jj = 0
          while (jj < d) { pred += w(jj) * (xi(jj) - mx(jj)); jj += 1 }
          val r = y(i) - pred
          cvErr(t) += r * r
          i += 1
        }
        t += 1
      }
      s += 1
    }
    var best = 0
    var t = 1
    while (t < KLambdas) {
      if (cvErr(t) < cvErr(best)) best = t
      t += 1
    }
    val (g, c) = gram(x, y, allRows, mxFull, myFull)
    val w = new Array[Double](d)
    t = 0
    while (t <= best) {
      cdSolve(g, c, lams(t) * n, w)
      t += 1
    }
    w
  }
}
