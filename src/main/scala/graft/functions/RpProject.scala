package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Rademacher random projection (Johnson–Lindenstrauss / Achlioptas 2003):
  * component j of the output is the exact integer sum
  * `y_j = sum_i q(v_i) * p(j, i)` with q the [[SrpSketch]] quantizer
  * (`floor(double(v)*2^20 + 0.5)`, null/non-finite -> 0) and p the
  * md5-derived +/-1 planes (family "rp", so equal seeds stay decorrelated
  * from the SRP sign bits). Output is array<double> whose values are those
  * EXACT integers (|y_j| <~ dim*2^21 << 2^53, so the doubles are lossless
  * and the DuckDB oracle reproduces them bit-for-bit) — cosine is scale
  * invariant, so downstream consumers ([[VecDot]], brute kNN, IVF
  * training/probing) use the projected vectors unchanged: E[cos(y_a, y_b)]
  * ~= cos(a, b) with error O(1/sqrt(outDim)), and every per-vector dot
  * drops from `dim` to `outDim` multiply-adds.
  *
  * Same non-literal-state design as [[SrpSketch]]/[[IvfProbe]]: one
  * outDim*dim byte plane matrix rides as a codegen reference object;
  * construct via the sql bridge ([[graft.pipeline.Similarity.rpProject]]).
  */
case class RpProject(child: Expression, outDim: Int, dim: Int, seed: Int)
    extends UnaryExpression {

  require(outDim >= 1, s"outDim must be positive, got $outDim")
  require(dim >= 1, s"dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rp_project expects array<float>/array<double>, got ${t.catalogString}")
  }

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  @transient private lazy val signsFlat: Array[Byte] =
    SrpSketch.signs(outDim, dim, seed, family = "rp")

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val isD = elemIsDouble
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        if (java.lang.Double.isFinite(x)) qv(i) = math.floor(x * 1048576.0 + 0.5).toLong
      }
      i += 1
    }
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0L
      val base = j * dim
      var t = 0
      while (t < n) { s += qv(t) * signsFlat(base + t); t += 1 }
      out(j) = s.toDouble
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("rpSigns", signsFlat, "byte[]")
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, a => {
      val v = ev.value
      s"""
         |int ${v}_n = java.lang.Math.min($a.numElements(), $dim);
         |long[] ${v}_qv = new long[${v}_n];
         |for (int ${v}_i = 0; ${v}_i < ${v}_n; ${v}_i++) {
         |  if (!$a.isNullAt(${v}_i)) {
         |    double ${v}_x = (double) $a.$get(${v}_i);
         |    if (java.lang.Double.isFinite(${v}_x)) {
         |      ${v}_qv[${v}_i] = (long) java.lang.Math.floor(${v}_x * 1048576.0 + 0.5);
         |    }
         |  }
         |}
         |double[] ${v}_out = new double[$outDim];
         |for (int ${v}_j = 0; ${v}_j < $outDim; ${v}_j++) {
         |  long ${v}_s = 0L;
         |  int ${v}_base = ${v}_j * $dim;
         |  for (int ${v}_t = 0; ${v}_t < ${v}_n; ${v}_t++) {
         |    ${v}_s += ${v}_qv[${v}_t] * $sref[${v}_base + ${v}_t];
         |  }
         |  ${v}_out[${v}_j] = (double) ${v}_s;
         |}
         |$v = new org.apache.spark.sql.catalyst.util.GenericArrayData(${v}_out);
       """.stripMargin
    })
  }

  override def prettyName: String = "rp_project"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
