package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native `srp_sketch` expression: HOF-formulation bit parity, pinned
  * sketch goldens on the driver embeddings fixture (the same values the
  * DuckDB q_srp_pairs oracle derives), banding pigeonhole property, and
  * the hub-star cap through Similarity.srpCandidatePairs.
  */
class SrpSketchSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val seed = 7

  /** Declarative formulation of the same semantics via built-ins only:
    * quantize to integers, project against literal +/-1 planes, pack sign
    * bits — an independent re-derivation of the expression's rule.
    */
  private def hofSrp(vec: org.apache.spark.sql.Column, bits: Int) = {
    val qv = transform(vec, v => floor(v.cast("double") * 1048576.0 + 0.5).cast("long"))
    (0 until bits).map { b =>
      val plane = typedLit((0 until dim).map(i => SrpSketch.planeSign(seed, b, i).toLong))
      val s = aggregate(zip_with(qv, plane, (q, p) => q * p), lit(0L), (acc, x) => acc + x)
      when(s >= 0L, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("srp_sketch matches the built-in formulation bit-for-bit on the fixture") {
    val cmp = embeddings.select(
      graft.pipeline.Similarity.srpSketch(col("embedding"), 48, dim, seed).as("fast"),
      hofSrp(col("embedding"), 48).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
    assert(cmp.count() === 500)
  }

  test("pinned sketch goldens match the md5/quantization rule end-to-end") {
    // independently computed (python hashlib + float arithmetic mirror —
    // the same derivation the DuckDB oracle performs)
    val expected = Map(0L -> 195621412957423L, 1L -> 191131578143941L, 2L -> 101401419811592L)
    val got = embeddings.filter(col("vec_id") < 3)
      .select(col("vec_id"), graft.pipeline.Similarity.srpSketch(col("embedding"), 48, dim, seed).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("identical vectors sketch identically; null vector -> null sketch") {
    val v = Array(0.5f, -0.25f, 0.125f)
    val df = Seq((1L, Some(v.toSeq)), (2L, Some(v.toSeq)), (3L, None))
      .toDF("id", "vec")
    val got = df.select(col("id"),
        graft.pipeline.Similarity.srpSketch(col("vec"), 16, 3, seed).as("sk"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).isDefined && got(1L) === got(2L))
    assert(got(3L).isEmpty)
  }

  test("degenerate vectors match the oracle rule: empty/all-null -> 0, non-finite -> no term") {
    val df = Seq(
      (1L, Some(Seq.empty[Option[Float]])), // empty -> sketch 0
      (2L, Some(Seq[Option[Float]](None, None, None))), // all null -> sketch 0
      (3L, Some(Seq[Option[Float]](Some(Float.NaN), Some(1.0f), Some(-2.0f)))),
      (4L, Some(Seq[Option[Float]](Some(0.0f), Some(1.0f), Some(-2.0f)))),
      (5L, Some(Seq[Option[Float]](Some(Float.PositiveInfinity), Some(1.0f), Some(-2.0f))))
    ).toDF("id", "vec")
    val got = df.select(col("id"),
        graft.pipeline.Similarity.srpSketch(col("vec"), 16, 3, seed).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 0L, "empty vector sketches to 0 (oracle: all-NULL sum)")
    assert(got(2L) === 0L, "all-null vector sketches to 0")
    // NaN and Inf contribute 0 exactly like a literal 0.0 element
    assert(got(3L) === got(4L))
    assert(got(5L) === got(4L))
  }

  test("srpCandidatePairs finds every pair within hamming <= bands-1 (pigeonhole)") {
    val sketches = embeddings
      .select(col("vec_id"), graft.pipeline.Similarity.srpSketch(col("embedding"), 48, dim, seed).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // expected pairs from a plain-Scala re-banding of the collected sketches
    val expected = (for {
      (i1, s1) <- sketches; (i2, s2) <- sketches if i1 < i2
      if (0 until 4).exists(b => ((s1 >>> (12 * b)) & 4095L) == ((s2 >>> (12 * b)) & 4095L))
    } yield (i1, i2)).toSet
    val got = graft.pipeline.Similarity
      .srpCandidatePairs(embeddings, "vec_id", "embedding", 48, 4, dim, seed,
        maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    // pigeonhole: every pair within hamming distance bands-1 is a candidate
    val close = (for {
      (i1, s1) <- sketches; (i2, s2) <- sketches if i1 < i2
      if java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (i1, i2)).toSet
    assert(close.subsetOf(got))
    assert(got.nonEmpty)
  }

  test("mega-bucket hub-star cap keeps degenerate buckets linear") {
    // 40 identical vectors: every band bucket has 40 members; cap 10 =>
    // star on the min id (39 pairs), not C(40,2) = 780
    val df = (0L until 40L).map(i => (i, Seq(1.0f, 2.0f, -3.0f))).toDF("id", "vec")
    val pairs = graft.pipeline.Similarity
      .srpCandidatePairs(df, "id", "vec", 16, 4, 3, seed, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (1L until 40L).map(i => (0L, i)).toSet)
  }
}
