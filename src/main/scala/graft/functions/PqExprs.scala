package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** PQ encode of an embedding column: array<double> → the m-byte code under
  * a [[graft.pipeline.Pq.PqModel]] (nearest codebook entry per subspace).
  * Reference-object codegen (the LangIdScore pattern: instance method,
  * never a companion helper). Null vector OR wrong-width vector → null
  * code (one ragged row must not kill a 10^12-row encode — the MediaCodec
  * degradation contract).
  */
case class PqEncode(child: Expression, model: graft.pipeline.Pq.PqModel)
    extends UnaryExpression {

  @transient private lazy val evaluator = new PqEncodeEval(model)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = evaluator.eval(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeEval", evaluator, classOf[PqEncodeEval].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $ref.eval($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_encode"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serializable encode wrapper shared by interpreted eval and codegen. */
final class PqEncodeEval(model: graft.pipeline.Pq.PqModel) extends Serializable {
  def eval(a: ArrayData): Array[Byte] = {
    if (a.numElements() != model.dim) return null
    val v = new Array[Double](model.dim)
    var i = 0
    while (i < v.length) {
      if (!a.isNullAt(i)) v(i) = a.getDouble(i)
      i += 1
    }
    model.encode(v)
  }
}

/** ADC score of a PQ code against a per-query lookup table: m table adds.
  * `luts` maps query_id → LUT (bounded by the adcKnn maxQueries guard) and
  * rides as ONE reference object shared by every row. Null code / null id /
  * unknown id → null score.
  */
case class PqAdc(code: Expression, queryId: Expression, m: Int,
                 luts: java.util.HashMap[Long, Array[Array[Double]]])
    extends BinaryExpression {

  override def left: Expression = code
  override def right: Expression = queryId

  @transient private lazy val evaluator = new PqAdcEval(m, luts)

  override def checkInputDataTypes(): TypeCheckResult = (code.dataType, queryId.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (binary, bigint), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(c: Any, q: Any): Any =
    evaluator.eval(c.asInstanceOf[Array[Byte]], q.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcEval", evaluator, classOf[PqAdcEval].getName)
    nullSafeCodeGen(ctx, ev, (c, q) => {
      s"""
         |java.lang.Double ${ev.value}_b = $ref.eval($c, $q);
         |${ev.isNull} = ${ev.value}_b == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}_b.doubleValue();
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_adc"

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(code = newLeft, queryId = newRight)
}

/** Serializable ADC wrapper shared by interpreted eval and codegen. */
final class PqAdcEval(m: Int, luts: java.util.HashMap[Long, Array[Array[Double]]])
    extends Serializable {
  def eval(code: Array[Byte], queryId: Long): java.lang.Double = {
    if (code == null || code.length != m) return null
    val table = luts.get(queryId)
    if (table == null) return null
    var acc = 0.0
    var s = 0
    while (s < m) { acc += table(s)(code(s) & 0xFF); s += 1 }
    acc
  }
}
