package graft.select

import graft.rng.{NumpyKernels, NumpyRandom, PyIntSet}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Reference-literal mirror of `featsel.select_features`
  * (/root/reference/src/autofeat/featsel.py:180-283, regression path,
  * keep=[], n_jobs=1) — every draw, reduction, and ordering reproduced
  * bit-for-bit:
  *
  *   - numpy legacy MT19937 stream via [[graft.rng.NumpyRandom]]
  *     (seed(i) / permutation / randn, featsel.py:229-231,34-37);
  *   - `nb_standard_scale` float32/float64 pairwise reductions via
  *     [[graft.rng.NumpyKernels]] (featsel.py:221-222);
  *   - CPython set table order via [[graft.rng.PyIntSet]] for
  *     `set(columns).difference(...)` (featsel.py:139) and
  *     `list(good_cols_set)` (featsel.py:173);
  *   - Counter first-occurrence order + stable `count − 1e-6·len(str(c))`
  *     tie-break sort (featsel.py:249-255);
  *   - pandas `DataFrame.corr` via the Welford-accumulation mirror of
  *     pandas `_libs.algos.nancorr` (featsel.py:266-271);
  *   - the solver via [[ParityLasso]], the op-order twin of the
  *     deterministic CV-lasso injected for sklearn's `LassoLarsCV` when
  *     tools/gen_featsel_parity_golden.py runs the reference.
  *
  * NumpyParitySpec pins this against a golden produced by the REFERENCE
  * featsel.py itself (running unmodified under tools/ref_shim.py on the
  * fixture of /root/reference/tests/test_featsel.py:8-18) — stage digests
  * and the final selection, which also equals the reference test's own
  * expectation {0, 5, 6}. This closes SURVEY §5's "RNG parity untestable"
  * deviation: everything around sklearn's solver internals is now proven
  * bit-exact; the solver itself is deliberately substituted on BOTH sides.
  *
  * Driver-side by design: a parity harness over fixture-scale data (the
  * distributed selection path is [[FeatSel]]; its documented deviations are
  * quantified by diffing against this mirror).
  */
object NumpyParity {

  final case class Trace(
      scaled: Array[Array[Float]],
      targetScaled: Array[Double],
      randIdx: Vector[Array[Int]],
      initCoef: Vector[Array[Double]],
      runSelected: Vector[List[Int]],
      counterOrder: List[Int],
      corrKeep: List[Int],
      finalSelected: List[Int])

  /** Mirror of `select_features(df, target, featsel_runs, keep=None,
    * problem_type="regression", n_jobs=1)`; `x` is the raw float64 input
    * matrix with implicit integer column labels 0..d-1 (a pandas
    * `RangeIndex`, as in the reference's own tests).
    */
  def selectFeatures(x: Array[Array[Double]], y: Array[Double], featselRuns: Int = 5): Trace = {
    require(x.length == y.length, "df and target dimension mismatch")
    require(featselRuns >= 1, "parity mirror requires featsel_runs >= 1")
    val n = x.length
    val d = if (n == 0) 0 else x(0).length

    // featsel.py:221-222 — scale in input dtype (float64), store as float32
    val scaled64 = NumpyKernels.standardScaleF64(x)
    val scaled = scaled64.map(_.map(_.toFloat))
    val targetScaled = NumpyKernels.standardScaleF64(y.map(Array(_))).map(_(0))

    val randIdxs = Vector.newBuilder[Array[Int]]
    val initCoefs = Vector.newBuilder[Array[Double]]
    val runSelected = Vector.newBuilder[List[Int]]
    val selectedFlat = ArrayBuffer.empty[Int]
    var rng: NumpyRandom = null

    var run = 0
    while (run < featselRuns) {
      rng = NumpyRandom(run) // np.random.seed(i), featsel.py:229
      val m = math.max(10, (0.85 * n).toInt)
      val perm = rng.permutation(n)
      randIdxs += perm // full permutation (the subsample is its prefix)
      val ridx = java.util.Arrays.copyOfRange(perm, 0, m)
      val sel = selectFeatures1Run(scaled, targetScaled, ridx, d, rng, initCoefs)
      runSelected += sel
      selectedFlat ++= sel
      run += 1
    }

    // featsel.py:248-255 — frequency vote with formula-length tie-break
    var counterOrder: List[Int] = Nil
    var corrKeep: List[Int] = Nil
    var goodCols: List[Int] = (0 until d).toList
    if (selectedFlat.nonEmpty) {
      val counts = mutable.LinkedHashMap.empty[Int, Int]
      selectedFlat.foreach(c => counts.update(c, counts.getOrElse(c, 0) + 1))
      counterOrder = counts.keys.toList
        .sortBy(c => counts(c) - 0.000001 * c.toString.length)(Ordering[Double].reverse)

      // featsel.py:258-271 — correlation filtering on the FULL scaled frame
      corrKeep = List(counterOrder.head)
      if (counterOrder.length > 1) {
        val cols = counterOrder.toArray
        val corr = nanCorr(cols.map(c => Array.tabulate(n)(i => scaled(i)(c))))
        var i = 1
        while (i < cols.length) {
          var mx = 0.0
          var r = 0
          while (r < i) { mx = math.max(mx, math.abs(corr(r)(i))); r += 1 }
          if (mx < 0.9) corrKeep = corrKeep :+ cols(i)
          i += 1
        }
      }
      goodCols = corrKeep
    }

    // featsel.py:276 — final noise filtering, RNG stream continues from the
    // last run's state
    val finalSel = noiseFiltering(subMatrix(scaled, 0 until n, goodCols), targetScaled, goodCols, rng)

    Trace(scaled, targetScaled, randIdxs.result(), initCoefs.result(), runSelected.result(),
      counterOrder, corrKeep, finalSel)
  }

  /** Mirror of `_select_features_1run` (featsel.py:92-177). */
  private def selectFeatures1Run(
      scaled: Array[Array[Float]], targetScaled: Array[Double], ridx: Array[Int],
      d: Int, rng: NumpyRandom, initCoefs: mutable.Builder[Array[Double], Vector[Array[Double]]]): List[Int] = {
    val nSub = ridx.length
    require(nSub > 1, s"n_samples = $nSub")
    val sub = Array.tabulate(nSub)(i => scaled(ridx(i)))
    val tSub = Array.tabulate(nSub)(i => targetScaled(ridx(i)))
    val allLabels = (0 until d).toList

    // initial fit on all columns (featsel.py:119)
    val coef0 = ParityLasso.fit(sub.map(_.map(_.toDouble)), tSub)
    initCoefs += coef0
    val coefs0 = coef0.map(math.abs)
    // featsel.py:129-131 — at most 0.2·n_train initial features
    val thr = coefs0.sorted(Ordering[Double].reverse).apply(math.min(d - 1, nSub / 5))
    var initialCols = allLabels.filter(j => coefs0(j) > thr)
    initialCols = noiseFiltering(subMatrix(sub, 0 until nSub, initialCols), tSub, initialCols, rng)

    val goodColsSet = PyIntSet(initialCols.map(_.toLong))
    // featsel.py:137 — noise block shared by all splits
    val xwNoise = addNoiseFeatures(subMatrix(sub, 0 until nSub, initialCols), rng)

    // featsel.py:139 — CPython set difference order, then a permutation
    val otherList = PyIntSet(allLabels.map(_.toLong)).differenceList(initialCols.map(_.toLong)).toList
    if (otherList.nonEmpty) {
      val pi = rng.permutation(otherList.length)
      val otherCols = pi.map(i => otherList(i).toInt)
      val nSplits = math.ceil(otherCols.length / math.max(10.0, 0.5 * nSub - initialCols.length)).toInt
      val splitSize = math.ceil(otherCols.length.toDouble / nSplits).toInt
      var s = 0
      while (s < nSplits) {
        val current = otherCols.slice(s * splitSize, math.min(otherCols.length, (s + 1) * splitSize)).toList
        val xCur = subMatrix(sub, 0 until nSub, current)
        val x64 = hstack(toF64(xCur), xwNoise)
        val coefs = ParityLasso.fit(x64, tSub).map(math.abs)
        val currentCols = current ++ initialCols
        // weights = dict(zip(current_cols, coefs)); noise thr over the rest
        var noiseThr = Double.NegativeInfinity
        var j = currentCols.length
        while (j < coefs.length) { noiseThr = math.max(noiseThr, coefs(j)); j += 1 }
        var k = 0
        currentCols.foreach { c =>
          if (math.abs(coefs(k)) > noiseThr) goodColsSet.add(c.toLong)
          k += 1
        }
        s += 1
      }
    }
    val goodCols = goodColsSet.toList.map(_.toInt)
    noiseFiltering(subMatrix(sub, 0 until nSub, goodCols), tSub, goodCols, rng)
  }

  /** Mirror of `_noise_filtering` (featsel.py:40-89, regression). */
  private def noiseFiltering(
      x32: Array[Array[Float]], target: Array[Double], goodCols0: List[Int],
      rng: NumpyRandom): List[Int] = {
    val nFeat = if (x32.isEmpty) 0 else x32(0).length
    val goodCols = if (goodCols0.isEmpty) (0 until nFeat).toList else goodCols0
    require(goodCols.length == nFeat, "fewer column names provided than features in X")
    val x64 = addNoiseFeatures(x32, rng)
    val coefs = ParityLasso.fit(x64, target).map(math.abs)
    var noiseThr = Double.NegativeInfinity
    var j = nFeat
    while (j < coefs.length) { noiseThr = math.max(noiseThr, coefs(j)); j += 1 }
    val weights = goodCols.zip(coefs.take(nFeat)).toMap
    goodCols.filter(c => weights(c) > noiseThr)
  }

  /** Mirror of `_add_noise_features` (featsel.py:22-37): shuffled copy of
    * the float32 block (standard-scaled to float64) plus gaussian columns,
    * hstacked to float64.
    */
  private def addNoiseFeatures(x32: Array[Array[Float]], rng: NumpyRandom): Array[Array[Double]] = {
    val n = x32.length
    val nFeat = if (n == 0) 0 else x32(0).length
    var out = toF64(x32)
    if (n > 50 && nFeat > 1) {
      val flat = new Array[Float](n * nFeat)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < nFeat) { flat(i * nFeat + j) = x32(i)(j); j += 1 }
        i += 1
      }
      val pi = rng.permutation(flat.length)
      val shuffled = Array.tabulate(n)(r => Array.tabulate(nFeat)(c => flat(pi(r * nFeat + c))))
      out = hstack(out, NumpyKernels.standardScaleF32(shuffled))
    }
    val g = math.max(3, (0.5 * nFeat).toInt)
    val gauss = Array.ofDim[Double](n, g)
    var r = 0
    while (r < n) {
      var c = 0
      while (c < g) { gauss(r)(c) = rng.nextGauss(); c += 1 }
      r += 1
    }
    hstack(out, gauss)
  }

  /** Mirror of pandas `_libs.algos.nancorr` (Welford accumulators, minp=1,
    * result clipped to [-1, 1]); input columns are the float32 frame
    * widened to float64 (pandas `ensure_float64`).
    */
  def nanCorr(cols: Array[Array[Float]]): Array[Array[Double]] = {
    val k = cols.length
    val n = if (k == 0) 0 else cols(0).length
    val out = Array.ofDim[Double](k, k)
    var xi = 0
    while (xi < k) {
      var yi = 0
      while (yi <= xi) {
        var nobs = 0
        var meanx = 0.0
        var meany = 0.0
        var sumxx = 0.0
        var sumyy = 0.0
        var sumxy = 0.0
        var i = 0
        while (i < n) {
          val vx = cols(xi)(i).toDouble
          val vy = cols(yi)(i).toDouble
          if (vx == vx && vy == vy) {
            nobs += 1
            val dx = vx - meanx
            val dy = vy - meany
            meanx += 1.0 / nobs * dx
            meany += 1.0 / nobs * dy
            sumxx += (vx - meanx) * dx
            sumyy += (vy - meany) * dy
            sumxy += (vx - meanx) * dy
          }
          i += 1
        }
        val v =
          if (nobs < 1) Double.NaN
          else {
            val divisor = math.sqrt(sumxx * sumyy)
            if (divisor != 0.0) {
              var r = sumxy / divisor
              if (r > 1.0) r = 1.0
              else if (r < -1.0) r = -1.0
              r
            } else Double.NaN
          }
        out(xi)(yi) = v
        out(yi)(xi) = v
        yi += 1
      }
      xi += 1
    }
    out
  }

  private def subMatrix(rows: Array[Array[Float]], rr: Range, cols: List[Int]): Array[Array[Float]] = {
    val ca = cols.toArray
    rr.map(i => Array.tabulate(ca.length)(j => rows(i)(ca(j)))).toArray
  }

  private def toF64(x: Array[Array[Float]]): Array[Array[Double]] =
    x.map(_.map(_.toDouble))

  private def hstack(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
    a.indices.map(i => a(i) ++ b(i)).toArray
}
