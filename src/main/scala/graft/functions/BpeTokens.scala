package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** BPE subword tokens of a string column as `array<string>` — the symbol
  * view feeding [[graft.pipeline.BpeTrainer]]'s pair counting (an
  * empty-merge model yields the code-point + `</w>` base symbols) and any
  * caller that wants the tokens themselves rather than ids/counts. Same
  * design as [[BpeCount]]/[[BpeEncode]]: the model rides as ONE reference
  * object, codegen emits a direct instance-method call (the static
  * forwarder trap — see LangModelSpec — does not apply to instance
  * methods), zero UDFs. Constructed via the sql bridge
  * ([[graft.pipeline.BpeModel.tokensCol]]) — carries non-literal state.
  */
case class BpeTokens(child: Expression, model: graft.pipeline.BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    model.tokenizeArrayData(s.toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      classOf[graft.pipeline.BpeModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenizeArrayData($c.toString())")
  }

  override def prettyName: String = "bpe_tokens"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
