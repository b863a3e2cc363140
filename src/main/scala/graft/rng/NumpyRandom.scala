package graft.rng

/** From-scratch MT19937 generator bit-compatible with numpy's legacy
  * `RandomState` (the reference's `np.random.seed` / `permutation` / `randn`
  * global stream, featsel.py:229-231,34-37,139).
  *
  * Implemented from the published Matsumoto–Nishimura MT19937 recurrence and
  * numpy's documented legacy distributions (all public knowledge):
  *
  *   - seeding: `np.random.seed(int)` — knuth-style LCG state fill with the
  *     32-bit seed (init_genrand), the path RandomState takes for seeds
  *     < 2^32;
  *   - `random_sample`: 53-bit double from two tempered words,
  *     (a·2^26 + b) / 2^53 with a = u1 >> 5, b = u2 >> 6;
  *   - `standard_normal`: Marsaglia polar method with the second deviate
  *     cached (numpy's legacy gauss — NOT the ziggurat of the new
  *     Generator API);
  *   - `permutation` / `shuffle`: descending Fisher–Yates where each swap
  *     index comes from masked rejection sampling of a tempered word
  *     (legacy random_interval, 32-bit path).
  *
  * Parity is pinned bit-for-bit against numpy 1.26 goldens in
  * NumpyRandomSpec (tools/gen_rng_golden.py). `standard_normal` additionally
  * depends on libm `log`, reproduced bit-for-bit by [[GlibcLog]]; `sqrt` is
  * IEEE-exact everywhere, so the whole gauss stream is exact (200k-draw
  * digest pinned in the spec).
  *
  * Not thread-safe (neither is the reference's global `np.random`). Each
  * selection run owns one instance seeded with its run index.
  */
final class NumpyRandom private () {
  private val key = new Array[Int](624)
  private var mti = 625
  private var hasGauss = false
  private var gaussCache = 0.0

  /** `np.random.seed(s)` for 0 <= s < 2^32. */
  def seed(s: Long): this.type = {
    require(s >= 0L && s <= 0xffffffffL, s"seed out of uint32 range: $s")
    var v = s & 0xffffffffL
    var pos = 0
    while (pos < 624) {
      key(pos) = v.toInt
      v = (1812433253L * (v ^ (v >>> 30)) + pos + 1) & 0xffffffffL
      pos += 1
    }
    mti = 624
    hasGauss = false
    gaussCache = 0.0
    this
  }

  private def genBlock(): Unit = {
    val UPPER = 0x80000000
    val LOWER = 0x7fffffff
    var i = 0
    while (i < 227) { // 624 - 397
      val y = (key(i) & UPPER) | (key(i + 1) & LOWER)
      key(i) = key(i + 397) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      i += 1
    }
    while (i < 623) {
      val y = (key(i) & UPPER) | (key(i + 1) & LOWER)
      key(i) = key(i - 227) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      i += 1
    }
    val y = (key(623) & UPPER) | (key(0) & LOWER)
    key(623) = key(396) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
    mti = 0
  }

  /** One tempered 32-bit word as an unsigned value in a Long. */
  def nextUInt32(): Long = {
    if (mti >= 624) genBlock()
    var y = key(mti)
    mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y.toLong & 0xffffffffL
  }

  /** `np.random.random_sample()`: uniform in [0, 1) with 53 random bits. */
  def nextDouble(): Double = {
    val a = nextUInt32() >>> 5
    val b = nextUInt32() >>> 6
    (a * 67108864.0 + b) / 9007199254740992.0
  }

  /** `np.random.standard_normal()` (legacy polar gauss, second value cached). */
  def nextGauss(): Double = {
    if (hasGauss) {
      val t = gaussCache
      hasGauss = false
      gaussCache = 0.0
      t
    } else {
      var x1 = 0.0
      var x2 = 0.0
      var r2 = 0.0
      do {
        x1 = 2.0 * nextDouble() - 1.0
        x2 = 2.0 * nextDouble() - 1.0
        r2 = x1 * x1 + x2 * x2
      } while (r2 >= 1.0 || r2 == 0.0)
      // numpy computes log via glibc, which differs from Math.log by 1 ULP
      // on ~0.03% of inputs — GlibcLog reproduces glibc's result bit-for-bit
      val f = math.sqrt(-2.0 * GlibcLog.log(r2) / r2)
      gaussCache = f * x1
      hasGauss = true
      f * x2
    }
  }

  /** Uniform integer in [0, max] (legacy random_interval, 32-bit path). */
  def nextInterval(max: Long): Long = {
    require(max >= 0L && max <= 0xffffffffL, s"interval max out of uint32 range: $max")
    if (max == 0L) 0L
    else {
      var mask = max
      mask |= mask >> 1
      mask |= mask >> 2
      mask |= mask >> 4
      mask |= mask >> 8
      mask |= mask >> 16
      var v = nextUInt32() & mask
      while (v > max) v = nextUInt32() & mask
      v
    }
  }

  /** In-place `np.random.shuffle`: descending Fisher–Yates, n-1 draws. */
  def shuffle(a: Array[Int]): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = nextInterval(i.toLong).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
  }

  /** In-place shuffle of a double array (same draw sequence as `shuffle`). */
  def shuffleDoubles(a: Array[Double]): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = nextInterval(i.toLong).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
  }

  /** Generic shuffle consuming the same draws as numpy's object-array path
    * (one interval draw per position, independent of element type).
    */
  def shuffled[T](xs: IndexedSeq[T]): IndexedSeq[T] = {
    val idx = Array.tabulate(xs.length)(identity)
    shuffle(idx)
    idx.toIndexedSeq.map(xs)
  }

  /** `np.random.permutation(n)`. */
  def permutation(n: Int): Array[Int] = {
    val a = Array.tabulate(n)(identity)
    shuffle(a)
    a
  }

  /** `np.random.randn(n)` draw order. */
  def standardNormal(n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = nextGauss(); i += 1 }
    out
  }

  /** `np.random.randn(rows, cols)` returned COLUMN-major (out(c)(r)); numpy
    * fills C-order, i.e. draw (r·cols + c) lands at [r, c].
    */
  def standardNormalCols(rows: Int, cols: Int): Array[Array[Double]] = {
    val out = Array.ofDim[Double](cols, rows)
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) { out(c)(r) = nextGauss(); c += 1 }
      r += 1
    }
    out
  }
}

object NumpyRandom {
  /** `np.random.seed(s)` + fresh stream, the reference's per-run setup. */
  def apply(s: Long): NumpyRandom = new NumpyRandom().seed(s)
}
