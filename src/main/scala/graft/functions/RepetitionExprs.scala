package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Gopher-style repetition signals (see
  * [[graft.pipeline.TextOps.dupLineRatio]] / `topWordRatio`): the
  * declarative formulations pay an interpreted lambda per line/token —
  * and `topWordRatio` is O(distinct x tokens) lambda evaluations per row
  * (count-by-filter per distinct token), which made the repetition scan
  * the second-heaviest documents query. These compute the identical
  * ratios in one hash pass per row. Ratios are exact-integer divisions,
  * so the doubles are bit-identical to the built-in formulations (and
  * the DuckDB oracles). CodegenFallback: one virtual call per ROW, same
  * trade as [[MinhashSig]]/[[WordNgrams]].
  */
private[functions] trait StringRatioExpr extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")

  /** Spark `trim` semantics: strip 0x20 spaces only (NOT Java trim's <= 0x20). */
  protected final def sparkTrim(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }
}

/** Fraction of non-empty (trimmed) lines that duplicate an earlier line. */
case class DupLineRatio(child: Expression) extends StringRatioExpr {

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val seen = new java.util.HashSet[String]()
    var total = 0
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == '\n') {
        val line = sparkTrim(text.substring(start, i))
        if (line.nonEmpty) { total += 1; seen.add(line) }
        start = i + 1
      }
      i += 1
    }
    if (total <= 0) 0.0 else (total - seen.size).toDouble / total.toDouble
  }

  override def prettyName: String = "dup_line_ratio"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fraction of tokens taken by the single most frequent lowercased token. */
case class TopWordRatio(child: Expression) extends StringRatioExpr {

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    // mirror filter(split(trim(lower(text)), "\s+"), length > 0)
    val text = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
    val toks = ws.split(text, -1)
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    var total = 0
    var best = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        total += 1
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    if (total <= 0) 0.0 else best.toDouble / total.toDouble
  }

  override def prettyName: String = "top_word_ratio"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
