package graft.rng

/** Bit-exact mirrors of the numpy reduction kernels the reference's
  * `nb_standard_scale` (nb_utils.py:25-37, run un-jitted under the golden
  * shim) executes: `np.nanmean` / `np.nanstd` per column and the broadcast
  * `(array - mean) / std`.
  *
  * numpy sums with pairwise reduction inside 128-element blocks (8 unrolled
  * partial accumulators, combined as ((r0+r1)+(r2+r3)) + ((r4+r5)+(r6+r7))),
  * recursive halving above 128 (split rounded down to a multiple of 8), and —
  * the non-obvious part — SEQUENTIAL accumulation across the reduce
  * iterator's 8192-element buffers. All three layers are pinned bit-for-bit
  * against numpy 1.26 by NumpyParitySpec (and were probed across sizes
  * 1..100001 with mixed-exponent data during development).
  *
  * `nanmean` on a strided column first takes a contiguous copy
  * (`_replace_nan` copies unconditionally for float dtypes), so all sums
  * here are over contiguous arrays. The float32 kernels stay in float32
  * through sum/divide/sqrt (value-based promotion keeps `f32 / intp` in
  * float32); results are stored into a float64 vector (`np.empty` in
  * nb_apply_along_axis), making the final `(array - mean) / std` broadcast a
  * float64 computation even for float32 input.
  */
object NumpyKernels {

  private val Block = 128
  private val Buf = 8192

  /** numpy pairwise_sum_FLOAT over a[lo until lo+n) — one ≤128 block layer. */
  private def pwF(a: Array[Float], lo: Int, n: Int): Float = {
    if (n < 8) {
      var res = 0.0f
      var i = 0
      while (i < n) { res += a(lo + i); i += 1 }
      res
    } else if (n <= Block) {
      val r = new Array[Float](8)
      var k = 0
      while (k < 8) { r(k) = a(lo + k); k += 1 }
      var i = 8
      val lim = n - (n % 8)
      while (i < lim) {
        r(0) += a(lo + i); r(1) += a(lo + i + 1); r(2) += a(lo + i + 2); r(3) += a(lo + i + 3)
        r(4) += a(lo + i + 4); r(5) += a(lo + i + 5); r(6) += a(lo + i + 6); r(7) += a(lo + i + 7)
        i += 8
      }
      var res = ((r(0) + r(1)) + (r(2) + r(3))) + ((r(4) + r(5)) + (r(6) + r(7)))
      while (i < n) { res += a(lo + i); i += 1 }
      res
    } else {
      var n2 = n / 2
      n2 -= n2 % 8
      pwF(a, lo, n2) + pwF(a, lo + n2, n - n2)
    }
  }

  private def pwD(a: Array[Double], lo: Int, n: Int): Double = {
    if (n < 8) {
      var res = 0.0
      var i = 0
      while (i < n) { res += a(lo + i); i += 1 }
      res
    } else if (n <= Block) {
      val r = new Array[Double](8)
      var k = 0
      while (k < 8) { r(k) = a(lo + k); k += 1 }
      var i = 8
      val lim = n - (n % 8)
      while (i < lim) {
        r(0) += a(lo + i); r(1) += a(lo + i + 1); r(2) += a(lo + i + 2); r(3) += a(lo + i + 3)
        r(4) += a(lo + i + 4); r(5) += a(lo + i + 5); r(6) += a(lo + i + 6); r(7) += a(lo + i + 7)
        i += 8
      }
      var res = ((r(0) + r(1)) + (r(2) + r(3))) + ((r(4) + r(5)) + (r(6) + r(7)))
      while (i < n) { res += a(lo + i); i += 1 }
      res
    } else {
      var n2 = n / 2
      n2 -= n2 % 8
      pwD(a, lo, n2) + pwD(a, lo + n2, n - n2)
    }
  }

  /** `np.add.reduce` over a float32 array: pairwise within 8192-element
    * iterator buffers, sequential across them.
    */
  def sumF32(a: Array[Float]): Float = {
    val n = a.length
    if (n == 0) return 0.0f
    var res = 0.0f
    var first = true
    var i = 0
    while (i < n) {
      val c = math.min(Buf, n - i)
      val s = pwF(a, i, c)
      res = if (first) s else res + s
      first = false
      i += c
    }
    res
  }

  /** `np.add.reduce` over a float64 array (same structure). */
  def sumF64(a: Array[Double]): Double = {
    val n = a.length
    if (n == 0) return 0.0
    var res = 0.0
    var first = true
    var i = 0
    while (i < n) {
      val c = math.min(Buf, n - i)
      val s = pwD(a, i, c)
      res = if (first) s else res + s
      first = false
      i += c
    }
    res
  }

  /** `np.nanmean` of a float32 column (result as the float32 value it is
    * before the float64 store).
    */
  def nanMeanF32(col: Array[Float]): Float = {
    val n = col.length
    val repl = new Array[Float](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val v = col(i)
      if (java.lang.Float.isNaN(v)) repl(i) = 0.0f else { repl(i) = v; cnt += 1 }
      i += 1
    }
    sumF32(repl) / cnt.toFloat
  }

  /** `np.nanstd` (ddof=0) of a float32 column: mean, masked deviations,
    * squared, pairwise-summed, divided, sqrt — all in float32. The double
    * sqrt rounds identically to a single-rounded float sqrt (53 ≥ 2·24+2).
    */
  def nanStdF32(col: Array[Float]): Float = {
    val n = col.length
    val repl = new Array[Float](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val v = col(i)
      if (java.lang.Float.isNaN(v)) repl(i) = 0.0f else { repl(i) = v; cnt += 1 }
      i += 1
    }
    val avg = sumF32(repl) / cnt.toFloat
    val sq = new Array[Float](n)
    i = 0
    while (i < n) {
      val d = if (java.lang.Float.isNaN(col(i))) 0.0f else repl(i) - avg
      sq(i) = d * d
      i += 1
    }
    math.sqrt((sumF32(sq) / cnt.toFloat).toDouble).toFloat
  }

  def nanMeanF64(col: Array[Double]): Double = {
    val n = col.length
    val repl = new Array[Double](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val v = col(i)
      if (java.lang.Double.isNaN(v)) repl(i) = 0.0 else { repl(i) = v; cnt += 1 }
      i += 1
    }
    sumF64(repl) / cnt.toDouble
  }

  def nanStdF64(col: Array[Double]): Double = {
    val n = col.length
    val repl = new Array[Double](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val v = col(i)
      if (java.lang.Double.isNaN(v)) repl(i) = 0.0 else { repl(i) = v; cnt += 1 }
      i += 1
    }
    val avg = sumF64(repl) / cnt.toDouble
    val sq = new Array[Double](n)
    i = 0
    while (i < n) {
      val d = if (java.lang.Double.isNaN(col(i))) 0.0 else repl(i) - avg
      sq(i) = d * d
      i += 1
    }
    math.sqrt(sumF64(sq) / cnt.toDouble)
  }

  /** `nb_standard_scale` of a float32 row-major matrix: float32 column
    * stats widened to float64, then `(x - m) / s` in float64. Returns
    * float64 row-major.
    */
  def standardScaleF32(rows: Array[Array[Float]]): Array[Array[Double]] = {
    val n = rows.length
    val d = if (n == 0) 0 else rows(0).length
    val m = new Array[Double](d)
    val s = new Array[Double](d)
    val col = new Array[Float](n)
    var j = 0
    while (j < d) {
      var i = 0
      while (i < n) { col(i) = rows(i)(j); i += 1 }
      m(j) = nanMeanF32(col).toDouble
      s(j) = nanStdF32(col).toDouble
      j += 1
    }
    val out = Array.ofDim[Double](n, d)
    var i = 0
    while (i < n) {
      var jj = 0
      while (jj < d) { out(i)(jj) = (rows(i)(jj).toDouble - m(jj)) / s(jj); jj += 1 }
      i += 1
    }
    out
  }

  /** `nb_standard_scale` of a float64 row-major matrix. */
  def standardScaleF64(rows: Array[Array[Double]]): Array[Array[Double]] = {
    val n = rows.length
    val d = if (n == 0) 0 else rows(0).length
    val m = new Array[Double](d)
    val s = new Array[Double](d)
    val col = new Array[Double](n)
    var j = 0
    while (j < d) {
      var i = 0
      while (i < n) { col(i) = rows(i)(j); i += 1 }
      m(j) = nanMeanF64(col)
      s(j) = nanStdF64(col)
      j += 1
    }
    val out = Array.ofDim[Double](n, d)
    var i = 0
    while (i < n) {
      var jj = 0
      while (jj < d) { out(i)(jj) = (rows(i)(jj) - m(jj)) / s(jj); jj += 1 }
      i += 1
    }
    out
  }
}
