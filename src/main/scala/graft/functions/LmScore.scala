package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bigram-LM scoring of a string column: struct(n_tokens, ll_per_token)
  * under the add-k-smoothed model in [[graft.pipeline.LmModel]] — the
  * CCNet-style perplexity quality signal as ONE codegen'd map stage (the
  * [[BpeCount]] design: model rides as a reference object, codegen emits
  * a direct method call; per-row cost is one hash lookup per token and
  * per bigram). Normalization matches the trainer: the UTF8String
  * lowercase/trim (identical to Spark's `lower`/`trim`) before the
  * whitespace split. Construct via the sql bridge
  * ([[graft.pipeline.LangModel.scoreCol]]) — carries non-literal state.
  */
case class LmScore(child: Expression, model: graft.pipeline.LmModel)
    extends UnaryExpression {

  // instance-method evaluator as the reference object (the BpeCount
  // design). NOT a companion static: the case class inherits
  // Expression.eval, so scalac emits no static forwarder for a companion
  // `eval` and Janino compilation of the generated call would fail,
  // silently demoting the whole stage to interpreted execution.
  @transient private lazy val evaluator = new LmEval(model)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lm_score expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("ll_per_token", DoubleType, nullable = false)))

  override def nullSafeEval(s: Any): Any =
    evaluator.eval(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmEval", evaluator, classOf[LmEval].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override def prettyName: String = "lm_score"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serializable scoring wrapper shared by interpreted eval and codegen —
  * an ordinary instance method, invokable from Janino-generated code.
  */
final class LmEval(model: graft.pipeline.LmModel) extends Serializable {
  def eval(text: UTF8String): GenericInternalRow = {
    val (n, ll) = model.score(text.toLowerCase.trim().toString)
    new GenericInternalRow(Array[Any](n, ll))
  }
}
