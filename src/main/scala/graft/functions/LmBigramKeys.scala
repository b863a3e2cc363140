package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Packed bigram keys of a token array under a fixed vocabulary: for each
  * consecutive token pair, `(idx(prev) << 32) | idx(cur)` with unseen
  * tokens mapped to `vocab.length` (the unk outcome) — the idx-mapped
  * bigram table of [[graft.pipeline.LangModel.train]] as ONE loop per row.
  *
  * Replaces the declarative formulation (a transform+struct lambda per
  * bigram plus TWO BroadcastHashJoins against the vocab frame, then a
  * groupBy on the (a, b) STRING pair): the mapping becomes a hash lookup
  * per token and the downstream shuffle key narrows from two strings to
  * one long (guide "shuffle fewer bytes"). Output entries are the exact
  * packed longs the trainer previously assembled on the driver, so the
  * aggregated (key, count) table is identical row-for-row
  * (LangModelSpec pins native ≡ join-formulation on the fixture corpus).
  *
  * Null ELEMENTS map to unk — exactly the left-join + coalesce(unkIdx)
  * behavior of the declarative path (a null token joins nothing). The
  * model rides as a reference object (the [[LmScore]] / BpeCount design:
  * instance-method evaluator, never a companion static — see the Janino
  * forwarder trap documented there). Arrays with fewer than two tokens
  * yield an empty array.
  */
case class LmBigramKeys(child: Expression, vocab: Array[String])
    extends UnaryExpression {

  @transient private lazy val evaluator = new LmBigramEval(vocab)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lm_bigram_keys expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(arr: Any): Any =
    evaluator.eval(arr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmBigramEval", evaluator, classOf[LmBigramEval].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override def prettyName: String = "lm_bigram_keys"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serializable evaluator shared by interpreted eval and codegen. */
final class LmBigramEval(vocab: Array[String]) extends Serializable {

  private val unkIdx: Long = vocab.length.toLong

  @transient private lazy val idx: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { m.put(vocab(i), java.lang.Long.valueOf(i.toLong)); i += 1 }
    m
  }

  private def indexOf(arr: ArrayData, i: Int): Long = {
    if (arr.isNullAt(i)) return unkIdx
    val v = idx.get(arr.getUTF8String(i).toString)
    if (v == null) unkIdx else v.longValue()
  }

  def eval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = indexOf(arr, 0)
    var i = 1
    while (i < n) {
      val cur = indexOf(arr, i)
      out(i - 1) = (prev << 32) | cur
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}
