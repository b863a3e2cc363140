package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Centered dense matrix projection: y_j = sum_i (v_i - mean_i) * M[j][i] —
  * the serving half of [[graft.pipeline.Pca]] (and any fixed linear map
  * over an embedding column). Same design as [[IvfProbe]]/[[RpProject]]:
  * mean and row-major k*dim matrix ride as reference objects, the k*dim
  * multiply-adds run inside whole-stage codegen. Null, missing, and
  * non-finite elements read as 0 BEFORE centering (matching Pca.train's
  * sanitization — one NaN element must not NaN the whole projection);
  * vectors longer than dim truncate.
  */
case class MatProject(child: Expression, mean: Array[Double], matFlat: Array[Double],
                      k: Int, dim: Int) extends UnaryExpression {

  require(mean.length == dim, s"mean length ${mean.length} != dim $dim")
  require(matFlat.length == k * dim, s"matrix shape ${matFlat.length} != $k*$dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mat_project expects array<float>/array<double>, got ${t.catalogString}")
  }

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isD = elemIsDouble
    val c = new Array[Double](dim)
    val m = math.min(a.numElements(), dim)
    var i = 0
    while (i < dim) {
      val raw = if (i < m && !a.isNullAt(i)) {
        if (isD) a.getDouble(i) else a.getFloat(i).toDouble
      } else 0.0
      c(i) = (if (java.lang.Double.isFinite(raw)) raw else 0.0) - mean(i)
      i += 1
    }
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      val base = j * dim
      var t = 0
      while (t < dim) { s += matFlat(base + t) * c(t); t += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("mpMean", mean, "double[]")
    val fref = ctx.addReferenceObj("mpMat", matFlat, "double[]")
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, a => {
      val v = ev.value
      s"""
         |int ${v}_m = java.lang.Math.min($a.numElements(), $dim);
         |double[] ${v}_c = new double[$dim];
         |for (int ${v}_i = 0; ${v}_i < $dim; ${v}_i++) {
         |  double ${v}_x = (${v}_i < ${v}_m && !$a.isNullAt(${v}_i))
         |    ? (double) $a.$get(${v}_i) : 0.0;
         |  if (!java.lang.Double.isFinite(${v}_x)) ${v}_x = 0.0;
         |  ${v}_c[${v}_i] = ${v}_x - $mref[${v}_i];
         |}
         |double[] ${v}_out = new double[$k];
         |for (int ${v}_j = 0; ${v}_j < $k; ${v}_j++) {
         |  double ${v}_s = 0.0;
         |  int ${v}_base = ${v}_j * $dim;
         |  for (int ${v}_t = 0; ${v}_t < $dim; ${v}_t++) {
         |    ${v}_s += $fref[${v}_base + ${v}_t] * ${v}_c[${v}_t];
         |  }
         |  ${v}_out[${v}_j] = ${v}_s;
         |}
         |$v = new org.apache.spark.sql.catalyst.util.GenericArrayData(${v}_out);
       """.stripMargin
    })
  }

  override def prettyName: String = "mat_project"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
