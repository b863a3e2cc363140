package graft.rng

import java.lang.Double.{doubleToRawLongBits, longBitsToDouble}
import java.lang.Math.fma

/** Double-precision natural log, bit-identical to the glibc `log` that numpy's
  * legacy `RandomState` gauss draws go through on this platform.
  *
  * This is a from-scratch Scala rendering of the published glibc algorithm
  * (sysdeps/ieee754/dbl-64/e_log.c, originally ARM optimized-routines): a
  * 128-entry (invc, logc) table over z in [0x1.6p-1, 0x1.6p0), a degree-5
  * log1p correction polynomial, and a separate degree-12 polynomial for x
  * near 1.0. glibc's runtime dispatcher selects the FMA-compiled variant on
  * this hardware, whose compiler-contracted multiply-adds change rounding on
  * ~1 in 3500 inputs vs the plain expression tree — so the Math.fma call
  * sequence below mirrors the compiled variant's instruction order exactly
  * (verified bit-for-bit against libm on ~10^6 inputs by
  * tools/gen_glibc_log_data.py before LogData is emitted, and pinned in
  * NumpyRandomSpec's 200k-draw gauss stream digest).
  *
  * Used by [[NumpyRandom.nextGauss]]: `Math.log` (HotSpot's own algorithm)
  * differs from glibc by 1 ULP on ~0.03% of inputs, which is exactly the gap
  * that kept bit-level selection parity vs the reference untestable
  * (SURVEY §5; reference featsel.py:34-37 uses np.random.randn).
  */
object GlibcLog {
  private val Off = 0x3fe6000000000000L
  private val Lo = 0x3fee000000000000L // asu(1 - 0x1p-4) = asu(0.9375)
  private val Hi = 0x3ff1090000000000L // asu(1 + 0x1.09p-4)
  private val OneBits = 0x3ff0000000000000L
  private val P27 = 134217728.0 // 0x1p27
  private val P52 = 4503599627370496.0 // 0x1p52

  /** log(x) for x > 0 finite (the RNG domain); honors the IEEE special cases
    * (+-0 -> -Inf, +Inf -> +Inf, negative/NaN -> NaN) without errno.
    */
  def log(x: Double): Double = {
    var ix = doubleToRawLongBits(x)
    if (java.lang.Long.compareUnsigned(ix - Lo, Hi - Lo) < 0) {
      // x in [0.9375, 1.06469726...): dedicated near-1 evaluation
      if (ix == OneBits) return 0.0
      val B = LogData.B
      val r = x - 1.0
      val r2 = r * r
      val r3 = r * r2
      val t1 = fma(r2, B(3), fma(r, B(2), B(1)))
      val t2 = fma(r2, B(6), fma(r, B(5), B(4)))
      val t3 = fma(r3, B(10), fma(r2, B(9), fma(r, B(8), B(7))))
      val v = fma(r3, fma(r3, t3, t2), t1)
      // split r = rhi + rlo for the exact -r^2/2 term
      val rhi = fma(-P27, r, fma(r, P27, r))
      val rlo = r - rhi
      val rhi2 = rhi * rhi
      val hi = fma(rhi2, B(0), r)
      val lo2 = fma(B(0) * rlo, r + rhi, fma(rhi2, B(0), r - hi))
      return hi + fma(r3, v, lo2)
    }
    val top = (ix >>> 48).toInt
    if (Integer.compareUnsigned(top - 0x0010, 0x7ff0 - 0x0010) >= 0) {
      // x <= 0, inf, nan, or subnormal
      if (ix << 1 == 0L) return Double.NegativeInfinity
      if (ix == 0x7ff0000000000000L) return x // +inf
      if ((top & 0x8000) != 0 || (top & 0x7ff0) == 0x7ff0) return Double.NaN
      // subnormal: normalize
      ix = doubleToRawLongBits(x * P52) - (52L << 52)
    }
    // x = 2^k z, z in [0x1.6p-1, 0x1.6p0); i indexes the table cell around z
    val tmp = ix - Off
    val i = ((tmp >>> 45) & 127L).toInt
    val k = (tmp >> 52).toInt
    val iz = ix - (tmp & 0xfffL << 52)
    val tab = LogData.Tab
    val invc = tab(2 * i)
    val logc = tab(2 * i + 1)
    val z = longBitsToDouble(iz)
    // log(x) = log1p(z/c - 1) + log(c) + k*ln2, r = z/c - 1 exact via fma
    val r = fma(z, invc, -1.0)
    val kd = k.toDouble
    val w = fma(kd, LogData.Ln2Hi, logc)
    val hi = w + r
    val lo = fma(kd, LogData.Ln2Lo, (w - hi) + r)
    val A = LogData.A
    val r2 = r * r
    val r3 = r * r2
    val poly = fma(r2, fma(r, A(4), A(3)), fma(r, A(2), A(1)))
    fma(r3, poly, fma(r2, A(0), lo)) + hi
  }
}
