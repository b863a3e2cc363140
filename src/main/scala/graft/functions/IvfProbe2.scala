package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Two-level IVF probe — the sharded-quantizer path for corpora where the
  * flat k ≈ √N rule exceeds [[IvfProbe]]'s practical ceiling (N ≈ 10^11:
  * √N ≈ 300k flat centroids would cost 300k·dim dots per row; k1 = k2 ≈ 550
  * costs (k1 + nProbeCoarse·k2)·dim).
  *
  * Stage 1 selects the `nProbeCoarse` coarse cells with the highest dot
  * product (as [[IvfProbe]]); stage 2 scores only those cells' fine
  * centroids (cell c's fine row j lives at `fineFlat[(c·k2+j)·dim ..]`) and
  * returns the top `nProbe` GLOBAL fine ids (c·k2 + j). Probed cells are
  * visited in ascending cell order, so ties break toward the smaller global
  * id — with nProbeCoarse = k1 the output is BIT-IDENTICAL to a flat
  * [[IvfProbe]] over the full fine matrix (pinned in PipelineSpec), which is
  * the exactness anchor for the pruned (nProbeCoarse < k1) fast path.
  */
case class IvfProbe2(child: Expression, coarseFlat: Array[Double], fineFlat: Array[Double],
                     k1: Int, k2: Int, dim: Int, nProbeCoarse: Int, nProbe: Int)
    extends UnaryExpression {

  require(k1 > 0 && k2 > 0 && dim > 0, "k1, k2, dim must be positive")
  require(coarseFlat.length == k1 * dim,
    s"coarse matrix shape mismatch: ${coarseFlat.length} != $k1*$dim")
  require(fineFlat.length == k1 * k2 * dim,
    s"fine matrix shape mismatch: ${fineFlat.length} != $k1*$k2*$dim")
  require(nProbeCoarse > 0 && nProbe > 0, "probe counts must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_probe2 expects array<float>/array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private val pc: Int = math.min(nProbeCoarse, k1)
  private val p: Int = math.min(nProbe, pc * k2)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val isD = elemIsDouble
    // stage 1: top-pc coarse cells (IvfProbe's insertion semantics)
    val cS = Array.fill(pc)(Double.NegativeInfinity)
    val cI = Array.tabulate(pc)(identity)
    var c = 0
    while (c < k1) {
      var s = 0.0
      var i = 0
      val base = c * dim
      while (i < n) {
        if (!a.isNullAt(i)) {
          val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
          s += coarseFlat(base + i) * x
        }
        i += 1
      }
      var j = pc
      while (j > 0 && s > cS(j - 1)) j -= 1
      if (j < pc) {
        var m = pc - 1
        while (m > j) { cS(m) = cS(m - 1); cI(m) = cI(m - 1); m -= 1 }
        cS(j) = s; cI(j) = c
      }
      c += 1
    }
    // ascending cell order => candidates visited in ascending GLOBAL id,
    // so the strictly-greater insertion ties toward the smaller global id
    java.util.Arrays.sort(cI)
    // stage 2: top-p fine centroids among the probed cells
    val bS = Array.fill(p)(Double.NegativeInfinity)
    val bI = new Array[Int](p)
    // identity init = the first p candidates in visit order (all-NaN sims
    // then yield them unchanged, matching a stable sort's tie order)
    var t = 0
    while (t < p) { bI(t) = cI(t / k2) * k2 + t % k2; t += 1 }
    var ci = 0
    while (ci < pc) {
      val cell = cI(ci)
      var f = 0
      while (f < k2) {
        val g = cell * k2 + f
        var s = 0.0
        var i = 0
        val base = g * dim
        while (i < n) {
          if (!a.isNullAt(i)) {
            val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
            s += fineFlat(base + i) * x
          }
          i += 1
        }
        var j = p
        while (j > 0 && s > bS(j - 1)) j -= 1
        if (j < p) {
          var m = p - 1
          while (m > j) { bS(m) = bS(m - 1); bI(m) = bI(m - 1); m -= 1 }
          bS(j) = s; bI(j) = g
        }
        f += 1
      }
      ci += 1
    }
    new GenericArrayData(bI)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("ivf2Coarse", coarseFlat, "double[]")
    val fi = ctx.addReferenceObj("ivf2Fine", fineFlat, "double[]")
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, a => {
      val v = ev.value
      s"""
         |int ${v}_n = java.lang.Math.min($a.numElements(), $dim);
         |double[] ${v}_cs = new double[$pc];
         |int[] ${v}_ci = new int[$pc];
         |java.util.Arrays.fill(${v}_cs, java.lang.Double.NEGATIVE_INFINITY);
         |for (int ${v}_t = 0; ${v}_t < $pc; ${v}_t++) ${v}_ci[${v}_t] = ${v}_t;
         |for (int ${v}_c = 0; ${v}_c < $k1; ${v}_c++) {
         |  double ${v}_s = 0.0;
         |  int ${v}_base = ${v}_c * $dim;
         |  for (int ${v}_i = 0; ${v}_i < ${v}_n; ${v}_i++) {
         |    if (!$a.isNullAt(${v}_i)) {
         |      ${v}_s += $co[${v}_base + ${v}_i] * (double) $a.$get(${v}_i);
         |    }
         |  }
         |  int ${v}_j = $pc;
         |  while (${v}_j > 0 && ${v}_s > ${v}_cs[${v}_j - 1]) ${v}_j--;
         |  if (${v}_j < $pc) {
         |    for (int ${v}_m = $pc - 1; ${v}_m > ${v}_j; ${v}_m--) {
         |      ${v}_cs[${v}_m] = ${v}_cs[${v}_m - 1];
         |      ${v}_ci[${v}_m] = ${v}_ci[${v}_m - 1];
         |    }
         |    ${v}_cs[${v}_j] = ${v}_s;
         |    ${v}_ci[${v}_j] = ${v}_c;
         |  }
         |}
         |java.util.Arrays.sort(${v}_ci);
         |double[] ${v}_bs = new double[$p];
         |int[] ${v}_bi = new int[$p];
         |java.util.Arrays.fill(${v}_bs, java.lang.Double.NEGATIVE_INFINITY);
         |for (int ${v}_t = 0; ${v}_t < $p; ${v}_t++) {
         |  ${v}_bi[${v}_t] = ${v}_ci[${v}_t / $k2] * $k2 + ${v}_t % $k2;
         |}
         |for (int ${v}_q = 0; ${v}_q < $pc; ${v}_q++) {
         |  int ${v}_cell = ${v}_ci[${v}_q];
         |  for (int ${v}_f = 0; ${v}_f < $k2; ${v}_f++) {
         |    int ${v}_g = ${v}_cell * $k2 + ${v}_f;
         |    double ${v}_s = 0.0;
         |    int ${v}_base = ${v}_g * $dim;
         |    for (int ${v}_i = 0; ${v}_i < ${v}_n; ${v}_i++) {
         |      if (!$a.isNullAt(${v}_i)) {
         |        ${v}_s += $fi[${v}_base + ${v}_i] * (double) $a.$get(${v}_i);
         |      }
         |    }
         |    int ${v}_j = $p;
         |    while (${v}_j > 0 && ${v}_s > ${v}_bs[${v}_j - 1]) ${v}_j--;
         |    if (${v}_j < $p) {
         |      for (int ${v}_m = $p - 1; ${v}_m > ${v}_j; ${v}_m--) {
         |        ${v}_bs[${v}_m] = ${v}_bs[${v}_m - 1];
         |        ${v}_bi[${v}_m] = ${v}_bi[${v}_m - 1];
         |      }
         |      ${v}_bs[${v}_j] = ${v}_s;
         |      ${v}_bi[${v}_j] = ${v}_g;
         |    }
         |  }
         |}
         |$v = new org.apache.spark.sql.catalyst.util.GenericArrayData(${v}_bi);
       """.stripMargin
    })
  }

  override def prettyName: String = "ivf_probe2"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
