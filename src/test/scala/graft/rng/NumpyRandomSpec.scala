package graft.rng

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Bit-level parity of NumpyRandom vs numpy 1.26's legacy RandomState.
  * Golden: src/test/resources/fixtures/numpy_rng_golden.tsv
  * (tools/gen_rng_golden.py) — regenerate BOTH together.
  */
class NumpyRandomSpec extends AnyFunSuite {

  private val rows: Seq[Array[String]] = {
    val src = scala.io.Source.fromFile("src/test/resources/fixtures/numpy_rng_golden.tsv")
    try src.getLines().map(_.split("\t")).toVector
    finally src.close()
  }

  private def hexToDouble(h: String): Double = {
    var bits = 0L
    // little-endian byte order: byte i holds bits 8i..8i+7
    var i = 0
    while (i < 8) {
      bits |= (java.lang.Long.parseLong(h.substring(2 * i, 2 * i + 2), 16) & 0xffL) << (8 * i)
      i += 1
    }
    java.lang.Double.longBitsToDouble(bits)
  }

  private def assertBitEqual(actual: Double, expected: Double, ctx: String): Unit =
    assert(java.lang.Double.doubleToRawLongBits(actual) ==
      java.lang.Double.doubleToRawLongBits(expected),
      s"$ctx: got $actual, numpy has $expected")

  test("random_sample doubles are bit-identical to np.random.random_sample") {
    for (r <- rows if r(0) == "dbl") {
      val rng = NumpyRandom(r(1).toLong)
      val n = r(2).toInt
      for (i <- 0 until n)
        assertBitEqual(rng.nextDouble(), hexToDouble(r(3 + i)), s"seed=${r(1)} dbl[$i]")
    }
  }

  test("standard_normal is bit-identical to np.random.randn (polar + cache)") {
    for (r <- rows if r(0) == "gauss") {
      val rng = NumpyRandom(r(1).toLong)
      val n = r(2).toInt
      for (i <- 0 until n)
        assertBitEqual(rng.nextGauss(), hexToDouble(r(3 + i)), s"seed=${r(1)} gauss[$i]")
    }
  }

  test("permutation matches np.random.permutation (Fisher-Yates + rejection sampling)") {
    for (r <- rows if r(0) == "perm") {
      val rng = NumpyRandom(r(1).toLong)
      val n = r(2).toInt
      val k = r(3).toInt
      val p = rng.permutation(n)
      for (i <- 0 until k)
        assert(p(i) == r(4 + i).toInt, s"seed=${r(1)} perm($n)[$i]")
    }
    for (r <- rows if r(0) == "permsum") {
      val rng = NumpyRandom(r(1).toLong)
      val n = r(2).toInt
      val p = rng.permutation(n)
      val sum = p.zipWithIndex.map { case (v, i) => i.toLong * v }.sum
      assert(sum == r(3).toLong, s"seed=${r(1)} full-permutation checksum")
    }
  }

  test("featsel-shaped composed sequences keep cross-call stream continuity") {
    for (r <- rows if r(0) == "seq") {
      val Array(seed, n, d, g, m) = r.slice(1, 6).map(_.toInt)
      val rng = NumpyRandom(seed.toLong)
      var f = 6
      // permutation(n)[:m] — the per-run subsample draw (featsel.py:230)
      val sub = rng.permutation(n).take(m)
      for (i <- 0 until 10) { assert(sub(i) == r(f).toInt, s"seed=$seed sub[$i]"); f += 1 }
      assert(sub.zipWithIndex.map { case (v, i) => i.toLong * v }.sum == r(f).toLong); f += 1
      // permutation(n*d) — the shuffled-noise flatten draw (featsel.py:34)
      val flat = rng.permutation(n * d)
      for (i <- 0 until 8) { assert(flat(i) == r(f).toInt, s"seed=$seed flat[$i]"); f += 1 }
      assert(flat.zipWithIndex.map { case (v, i) => i.toLong * v }.sum == r(f).toLong); f += 1
      // randn(n, g) C-order (featsel.py:37)
      val z = rng.standardNormalCols(n, g)
      val cOrder = for (row <- 0 until n; c <- 0 until g) yield z(c)(row)
      for (i <- 0 until 8) { assertBitEqual(cOrder(i), hexToDouble(r(f)), s"seed=$seed randn[$i]"); f += 1 }
      assertBitEqual(cOrder.sum, hexToDouble(r(f)), s"seed=$seed randn sum"); f += 1
      // stream continues correctly after the gauss cache
      val post = rng.permutation(n)
      for (i <- 0 until 8) { assert(post(i) == r(f).toInt, s"seed=$seed post[$i]"); f += 1 }
    }
  }

  test("GlibcLog.log is bit-identical to the runtime libm log") {
    var n = 0
    for (r <- rows if r(0) == "logpair") {
      val x = hexToDouble(r(1))
      assertBitEqual(GlibcLog.log(x), hexToDouble(r(2)), s"log(${x})")
      n += 1
    }
    assert(n > 100, s"expected the golden to carry >100 logpair rows, saw $n")
    // specials (not golden-backed: fixed IEEE semantics)
    assert(GlibcLog.log(0.0).isNegInfinity)
    assert(GlibcLog.log(-1.0).isNaN)
    assert(GlibcLog.log(Double.PositiveInfinity).isPosInfinity)
    assert(GlibcLog.log(1.0) == 0.0)
  }

  test("200k-draw gauss stream digest matches numpy (libm log agreement window)") {
    for (r <- rows if r(0) == "gaussstream") {
      val rng = NumpyRandom(r(1).toLong)
      val n = r(2).toInt
      val md = MessageDigest.getInstance("SHA-256")
      val buf = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) {
        buf.clear()
        buf.putDouble(rng.nextGauss())
        md.update(buf.array())
        i += 1
      }
      val dig = md.digest().map(b => f"${b & 0xff}%02x").mkString
      assert(dig == r(3), s"seed=${r(1)} gauss stream digest diverged within $n draws")
    }
  }
}
