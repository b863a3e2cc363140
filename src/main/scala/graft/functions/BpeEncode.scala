package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** BPE token-ID encoding of a string column — the `input_ids` producer
  * feeding [[graft.pipeline.Pack.packSequences]]. Same design as
  * [[BpeCount]]: the merge model + vocab ride as ONE reference object and
  * codegen emits a direct method call, so encoding stays inside whole-stage
  * codegen with zero UDF overhead. Tokenization semantics are
  * [[graft.pipeline.BpeModel.tokenizeWord]]'s (pinned against the Python
  * golden); id mapping is [[graft.pipeline.BpeEncoder]]'s (vocab line
  * index; unknown tokens -> `<unk>` = 0). Constructed directly via the sql
  * bridge ([[graft.pipeline.BpeModel.encodeCol]]) — carries non-literal
  * state, so no extension registration by name.
  */
case class BpeEncode(child: Expression, encoder: graft.pipeline.BpeEncoder)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    encoder.encodeArrayData(s.toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[graft.pipeline.BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeArrayData($c.toString())")
  }

  override def prettyName: String = "bpe_encode"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
