package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Char-n-gram naive-Bayes language scoring of a string column:
  * struct(lang, ll) under [[graft.pipeline.LangId.LangIdModel]] — ONE
  * codegen'd map stage (the [[LmScore]] design: the model rides as a
  * reference object, codegen calls an ordinary INSTANCE method — never a
  * companion-object helper, which gets no static forwarder and silently
  * demotes the stage to interpreted execution). Normalization is the
  * UTF8String lowercase (identical to Spark's `lower`, hence to the
  * trainer's `lower(col)`); `ll` is the winning log-likelihood already
  * rounded to 6 digits (the argmax ranks on the rounded value so a SQL
  * oracle reproduces the winner). Construct via the sql bridge
  * ([[graft.pipeline.LangId.scoreCol]]) — carries non-literal state.
  */
case class LangIdScore(child: Expression, model: graft.pipeline.LangId.LangIdModel)
    extends UnaryExpression {

  @transient private lazy val evaluator = new LangIdEval(model)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"langid_score expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("ll", DoubleType, nullable = false)))

  override def nullSafeEval(s: Any): Any =
    evaluator.eval(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdEval", evaluator, classOf[LangIdEval].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override def prettyName: String = "langid_score"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serializable scoring wrapper shared by interpreted eval and codegen. */
final class LangIdEval(model: graft.pipeline.LangId.LangIdModel) extends Serializable {
  def eval(text: UTF8String): GenericInternalRow = {
    val (lang, ll) = model.score(text.toLowerCase.toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(lang), ll))
  }
}

/** Two-class naive-Bayes decision margin of a string column:
  * round6(ll(pos)) - round6(ll(neg)) under a [[graft.pipeline.LangId]]
  * model — the model-based quality-filter score
  * ([[graft.pipeline.QualityFilter]]). Same codegen shape as
  * [[LangIdScore]] (reference object, instance method); null text → null.
  */
case class LangIdMargin(child: Expression, model: graft.pipeline.LangId.LangIdModel,
                        posIdx: Int, negIdx: Int)
    extends UnaryExpression {

  @transient private lazy val evaluator = new LangIdMarginEval(model, posIdx, negIdx)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"langid_margin expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(s: Any): Any =
    evaluator.eval(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdMarginEval", evaluator,
      classOf[LangIdMarginEval].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override def prettyName: String = "langid_margin"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serializable margin wrapper shared by interpreted eval and codegen. */
final class LangIdMarginEval(model: graft.pipeline.LangId.LangIdModel,
                             posIdx: Int, negIdx: Int) extends Serializable {
  def eval(text: UTF8String): Double =
    model.margin(text.toLowerCase.toString, posIdx, negIdx)
}
