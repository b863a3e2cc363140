package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Signed-random-projection (SRP) sketch of an embedding vector: bit `b` of
  * the result is set iff the vector's projection onto pseudo-random
  * Rademacher hyperplane `b` is non-negative. SRP is the standard LSH family
  * for cosine similarity (Charikar, STOC 2002): P[bit differs] = angle/pi,
  * so banding the sketch buckets near-duplicates WITHOUT any training —
  * the training-free complement to the IVF path in
  * [[graft.pipeline.Similarity]].
  *
  * Exactness by construction (the property the DuckDB driver oracle needs):
  *  - elements are quantized to integers `q = floor(double(v)*2^20 + 0.5)`
  *    BEFORE projecting, and hyperplane entries are +/-1, so each
  *    projection is an exact integer sum — no floating-point tie can make
  *    the sign flip between engines or between summation orders;
  *  - hyperplane entry (b, i) is +1 iff the md5-derived 60-bit hash of
  *    `"srp:<seed>:<b>:<i>"` (first 15 hex chars, the same digest-to-long
  *    rule as [[SimhashExpr]]) has its lowest bit clear — reproducible in
  *    any engine with md5.
  *
  * |q| <= 2^21 for unit-norm-ish embeddings and dim <= 2^40 keeps the sum
  * far from Long overflow. Null and non-finite elements quantize to 0 (no
  * contribution) — NaN/Inf would otherwise error DuckDB's BIGINT cast
  * while the JVM silently saturates, the cross-engine divergence class the
  * oracles must exclude. Vectors longer than `dim` truncate, shorter ones
  * use the overlap ([[VecDot]]'s laxer total rule). A vector with NO
  * usable element (empty array or all elements null) sketches to 0 —
  * the oracle's all-NULL SUM yields bit 0 everywhere, and "all bits set"
  * for s = 0 would instead bucket every empty vector with genuine
  * all-positive-projection vectors.
  *
  * The plane matrix rides as ONE bits*dim byte reference object inside
  * whole-stage codegen (the [[IvfProbe]] pattern); like IvfProbe it carries
  * non-literal state, so callers construct it via the sql bridge rather
  * than by SQL name.
  */
case class SrpSketch(child: Expression, bits: Int, dim: Int, seed: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 60, s"srp bits must be in [1, 60], got $bits")
  require(dim >= 1, s"dim must be positive, got $dim")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_sketch expects array<float>/array<double>, got ${t.catalogString}")
  }

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // recomputed per JVM (driver at codegen time, executors for interpreted
  // eval) — bits*dim md5 calls once, never per row
  @transient private lazy val signsFlat: Array[Byte] = SrpSketch.signs(bits, dim, seed)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val isD = elemIsDouble
    val qv = new Array[Long](n)
    var terms = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        terms += 1
        val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        if (java.lang.Double.isFinite(x)) qv(i) = math.floor(x * 1048576.0 + 0.5).toLong
      }
      i += 1
    }
    if (terms == 0) return 0L
    var out = 0L
    var b = 0
    while (b < bits) {
      var s = 0L
      val base = b * dim
      var j = 0
      while (j < n) { s += qv(j) * signsFlat(base + j); j += 1 }
      if (s >= 0L) out |= 1L << b
      b += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("srpSigns", signsFlat, "byte[]")
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, a => {
      val v = ev.value
      s"""
         |int ${v}_n = java.lang.Math.min($a.numElements(), $dim);
         |long[] ${v}_qv = new long[${v}_n];
         |int ${v}_t = 0;
         |for (int ${v}_i = 0; ${v}_i < ${v}_n; ${v}_i++) {
         |  if (!$a.isNullAt(${v}_i)) {
         |    ${v}_t++;
         |    double ${v}_x = (double) $a.$get(${v}_i);
         |    if (java.lang.Double.isFinite(${v}_x)) {
         |      ${v}_qv[${v}_i] = (long) java.lang.Math.floor(${v}_x * 1048576.0 + 0.5);
         |    }
         |  }
         |}
         |long ${v}_out = 0L;
         |if (${v}_t > 0) {
         |  for (int ${v}_b = 0; ${v}_b < $bits; ${v}_b++) {
         |    long ${v}_s = 0L;
         |    int ${v}_base = ${v}_b * $dim;
         |    for (int ${v}_j = 0; ${v}_j < ${v}_n; ${v}_j++) {
         |      ${v}_s += ${v}_qv[${v}_j] * $sref[${v}_base + ${v}_j];
         |    }
         |    if (${v}_s >= 0L) ${v}_out |= 1L << ${v}_b;
         |  }
         |}
         |$v = ${v}_out;
       """.stripMargin
    })
  }

  override def prettyName: String = "srp_sketch"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSketch {

  /** +1/-1 for hyperplane entry (b, i): lowest bit of the 60-bit md5 hash of
    * `"<family>:<seed>:<b>:<i>"` clear => +1. DuckDB mirror:
    * `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) & 1 = 0`.
    * Distinct family prefixes keep the SRP bits and the JL projection
    * ([[RpProject]]) decorrelated at equal seeds.
    */
  def planeSign(seed: Int, b: Int, i: Int, family: String = "srp"): Int =
    if ((md5Top60(s"$family:$seed:$b:$i") & 1L) == 0L) 1 else -1

  /** Flattened bits x dim Rademacher plane matrix (row-major by bit). */
  def signs(bits: Int, dim: Int, seed: Int, family: String = "srp"): Array[Byte] = {
    val out = new Array[Byte](bits * dim)
    var b = 0
    while (b < bits) {
      var i = 0
      while (i < dim) { out(b * dim + i) = planeSign(seed, b, i, family).toByte; i += 1 }
      b += 1
    }
    out
  }

  /** First 15 hex chars of the md5 digest as a long (top 60 bits) — the
    * digest-to-long rule shared with [[SimhashExpr]] and the DuckDB
    * oracles' `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`.
    */
  private[graft] def md5Top60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
    (h << 4) | ((d(7) & 0xF0L) >> 4)
  }
}
