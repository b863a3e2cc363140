package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Exact BPE subword token count over a string column. The merge-rank model
  * rides as ONE reference object (broadcast with the task binary, shared by
  * every row of the partition) and codegen emits a direct method call — the
  * expression stays inside whole-stage codegen with zero UDF overhead.
  * Counting semantics live in [[graft.pipeline.BpeModel.countTokens]],
  * pinned against the Python golden by BpeSpec. Carries non-literal state,
  * so callers construct it directly via the sql bridge
  * ([[graft.pipeline.BpeModel.countCol]]) rather than by name.
  */
case class BpeCount(child: Expression, model: graft.pipeline.BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(s: Any): Any =
    model.countTokens(s.toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[graft.pipeline.BpeModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c.toString())")
  }

  override def prettyName: String = "bpe_count"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
