package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03
  * — the MOSS algorithm): normalize the text (lowercase, trim, collapse
  * whitespace runs to one space), hash every character `k`-gram (md5 top 60
  * bits — the digest-to-long rule shared with [[SimhashExpr]] and the
  * DuckDB oracles), then in every window of `w` consecutive gram hashes
  * select the minimum (leftmost on ties). Output: array of
  * (pos, hash) structs, positions 0-based into the NORMALIZED text,
  * strictly increasing, each position emitted once.
  *
  * Guarantee: two documents sharing a normalized substring of length
  * >= w + k - 1 always share at least one selected fingerprint — the
  * content-defined sampling that makes distributed substring-level dedup
  * (Lee et al., ACL'22 regime) possible without suffix arrays: expected
  * density is 2/(w+1) fingerprints per position regardless of alignment.
  *
  * Docs shorter than k grams yield an empty array; docs with fewer than
  * `w` grams are treated as one window (their global min is selected).
  * Positions and gram lengths count CODE POINTS — the unit Spark's
  * `substring`/`length` and DuckDB's `substr`/`len` use — so the span
  * rebuild in [[graft.pipeline.Dedup.substringDedup]] and the oracle cut
  * exactly the flagged characters even on astral-plane text (emoji are
  * routine in web corpora; UTF-16 code-unit positions would shift every
  * span after the first surrogate pair).
  *
  * One md5 per position dominates the cost (CodegenFallback is one virtual
  * call per ROW on top — the [[SimhashExpr]] trade); window minima come
  * from an O(n) monotonic deque, not an O(n*w) rescan.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2, s"winnow gram size k must be >= 2, got $k")
  require(w >= 1, s"winnow window w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow expects a string argument, got ${child.dataType.catalogString}")

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val norm = ws.matcher(input.asInstanceOf[UTF8String].toLowerCase.trim().toString)
      .replaceAll(" ")
    // code-point offsets: off(i) = UTF-16 index of code point i; the gram
    // at code-point position i spans norm[off(i), off(i+k))
    val nCp = norm.codePointCount(0, norm.length)
    val off = new Array[Int](nCp + 1)
    var u = 0
    var cp = 0
    while (u < norm.length) { off(cp) = u; u += Character.charCount(norm.codePointAt(u)); cp += 1 }
    off(nCp) = norm.length
    val n = nCp - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](n)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(norm.substring(off(i), off(i + k)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var x = 0L
      var b = 0
      while (b < 7) { x = (x << 8) | (d(b) & 0xFFL); b += 1 }
      h(i) = (x << 4) | ((d(7) & 0xF0L) >> 4)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var last = -1
    def emit(p: Int): Unit = if (p != last) {
      out += new GenericInternalRow(Array[Any](p, h(p))); last = p
    }
    if (n < w) {
      // degenerate single window: leftmost global min
      var best = 0
      var j = 1
      while (j < n) { if (h(j) < h(best)) best = j; j += 1 }
      emit(best)
    } else {
      // monotonic deque of positions; strict pops keep the LEFTMOST of
      // equal minima at the front
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      var j = 0
      while (j < n) {
        while (tail > head && h(dq(tail - 1)) > h(j)) tail -= 1
        dq(tail) = j; tail += 1
        val winStart = j - w + 1
        if (winStart >= 0) {
          while (dq(head) < winStart) head += 1
          emit(dq(head))
        }
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def prettyName: String = "winnow"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
