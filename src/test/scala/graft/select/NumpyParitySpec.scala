package graft.select

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Bit-level selection parity vs the REFERENCE `featsel.select_features`
  * running unmodified (under tools/ref_shim.py, with the deterministic
  * twin solver injected for sklearn's LassoLarsCV). Goldens
  * (tools/gen_featsel_parity_golden.py — regenerate together with any
  * mirror change):
  *
  *   - featsel_parity_golden.tsv: the reference's own test fixture
  *     (test_featsel.py:8-18, n=1000 d=7); the final selection also equals
  *     the reference test's own expectation {0, 5, 6} (test_featsel.py:36).
  *   - featsel_parity_golden2.tsv: adversarial — small n (multi-split
  *     path), d=30, a corr≈0.999 near-duplicate column pair whose vote
  *     split forces a correlation-filter drop, weak signals so runs
  *     disagree and the Counter tie-break matters.
  *
  * Stage-by-stage assertions: scaled-frame digest (float32 pairwise
  * reductions), full per-run subsample permutations (MT19937 stream),
  * per-run initial-fit coefficient digests (solver twin), per-run selected
  * lists (set/threshold ordering), Counter + correlation-filter orders,
  * final selection.
  */
class NumpyParitySpec extends AnyFunSuite {

  private def hexToDouble(h: String): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) {
      bits |= (java.lang.Long.parseLong(h.substring(2 * i, 2 * i + 2), 16) & 0xffL) << (8 * i)
      i += 1
    }
    java.lang.Double.longBitsToDouble(bits)
  }

  private def sha256(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private final case class Golden(name: String, rows: Seq[Array[String]]) {
    val x: Array[Array[Double]] =
      rows.filter(_(0) == "X").map(r => (r(1).toInt, r.drop(2).map(hexToDouble)))
        .sortBy(_._1).map(_._2).toArray
    val y: Array[Double] =
      rows.filter(_(0) == "y").sortBy(_(1).toInt).flatMap(_.drop(2).map(hexToDouble)).toArray
    def field(n: String): Array[String] = rows.find(_(0) == n).get.drop(1)
    lazy val trace: NumpyParity.Trace = NumpyParity.selectFeatures(x, y, featselRuns = 5)
  }

  private def load(file: String): Golden = {
    val src = scala.io.Source.fromFile(s"src/test/resources/fixtures/$file")
    try Golden(file, src.getLines().map(_.split("\t")).toVector)
    finally src.close()
  }

  private val goldens = Seq(load("featsel_parity_golden.tsv"), load("featsel_parity_golden2.tsv"))

  test("fixtures load") {
    assert(goldens(0).x.length == 1000 && goldens(0).x(0).length == 7)
    assert(goldens(1).x.length == 60 && goldens(1).x(0).length == 30)
  }

  for (g <- goldens) {
    val tag = g.name.stripSuffix(".tsv")

    test(s"$tag: scaled frame is bit-identical (pairwise reduction mirror)") {
      val n = g.x.length
      val d = g.x(0).length
      val buf = ByteBuffer.allocate(n * d * 4).order(ByteOrder.LITTLE_ENDIAN)
      g.trace.scaled.foreach(_.foreach(buf.putFloat))
      assert(sha256(buf.array()) == g.field("scaled_sha")(0))
      val tb = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
      g.trace.targetScaled.foreach(tb.putDouble)
      assert(sha256(tb.array()) == g.field("tscaled_sha")(0))
    }

    test(s"$tag: per-run subsample permutations are bit-identical (MT19937)") {
      for (r <- g.rows if r(0) == "randidx") {
        val run = r(1).toInt
        val perm = g.trace.randIdx(run)
        assert(perm.take(12).sameElements(r.slice(2, 14).map(_.toInt)), s"run $run first-12")
        val chk = perm.zipWithIndex.map { case (v, i) => i.toLong * v }.sum
        assert(chk == r(14).toLong, s"run $run checksum")
      }
    }

    test(s"$tag: per-run initial-fit coefficients are bit-identical (solver twin)") {
      for (r <- g.rows if r(0) == "initcoef") {
        val run = r(1).toInt
        val coef = g.trace.initCoef(run)
        val buf = ByteBuffer.allocate(coef.length * 8).order(ByteOrder.LITTLE_ENDIAN)
        coef.foreach(buf.putDouble)
        assert(sha256(buf.array()) == r(2), s"run $run initial coef_ digest")
      }
    }

    test(s"$tag: per-run selected feature lists match exactly (order included)") {
      for (r <- g.rows if r(0) == "run")
        assert(g.trace.runSelected(r(1).toInt) == r.drop(2).map(_.toInt).toList, s"run ${r(1)}")
    }

    test(s"$tag: Counter tie-break order and correlation-filter survivors match") {
      assert(g.trace.counterOrder == g.field("counter").map(_.toInt).toList)
      assert(g.trace.corrKeep == g.field("corrkeep").map(_.toInt).toList)
    }

    test(s"$tag: final selection matches the reference run") {
      assert(g.trace.finalSelected == g.field("final").map(_.toInt).toList)
    }
  }

  test("reference test expectation holds: fixture-1 selection is {0, 5, 6}") {
    // test_featsel.py:36
    assert(goldens(0).trace.finalSelected.toSet == Set(0, 5, 6))
  }

  test("adversarial fixture exercised the stages it was built for") {
    val t = goldens(1).trace
    assert(t.runSelected.toSet.size > 1, "runs should disagree")
    assert(t.counterOrder.contains(1) && !t.corrKeep.contains(1),
      "near-duplicate column must enter the vote and be corr-dropped")
  }
}
