package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Bit-identical fast path for Catalyst `round(double, scale)` (HALF_UP).
  *
  * Catalyst's Round on DoubleType computes
  * `BigDecimal.valueOf(d).setScale(scale, HALF_UP).toDouble` per value —
  * a Double.toString (shortest decimal repr), a BigDecimal allocation, a
  * decimal setScale and a decimal→binary parse, ~430 ns/value measured at
  * sf0.1 (q_transforms spent 0.78 of its 0.92 s in three rounds per row;
  * every similarity query pays it once per candidate pair). This
  * expression computes the SAME double with pure FP arithmetic outside a
  * provably-safe guard band and falls back to the exact BigDecimal path
  * inside it:
  *
  * - `x = d * 10^scale` (10^scale is exact for scale ≤ 15). Let `frac` be
  *   the fractional part of |x|. All three candidate values that Catalyst
  *   may effectively round — the true scaled value `d·10^scale`, the
  *   shortest-repr scaled value `repr(d)·10^scale` (what BigDecimal.valueOf
  *   sees), and our computed `x` — agree to within `|x|·2^-52 + 2^-1022`
  *   (one FP multiply error plus half a ulp of the shortest repr, each
  *   ≤ |x|·2^-53). The guard band `band = |x|·1e-14 + 1e-12` exceeds that
  *   bound by ≥ 45×, so outside the band all three values share the same
  *   nearest integer `n`, no half-way tie is possible, and HALF_UP equals
  *   round-to-nearest: the result is `±n / 10^scale` — and IEEE division
  *   by the exact power of ten is correctly rounded, which is exactly what
  *   `BigDecimal(n, -scale).toDouble` produces.
  * - Inside the band (ties and near-ties), at |x| ≥ 2^51 (integer spacing),
  *   or for NaN/±Inf/scale > 15: delegate to the exact Catalyst arithmetic.
  * - A result of zero returns +0.0 regardless of sign (BigDecimal has no
  *   signed zero — Catalyst's round(-1e-9, 6) is +0.0). Callers that need
  *   IEEE -0.0 keep their explicit sign fix-up (q_scale's ieeeRound6).
  *
  * FastRoundSpec pins bit-equality against Catalyst Round on constructed
  * near-ties, specials and multi-magnitude fuzz (doubleToLongBits compare).
  * Codegen calls an instance method on a reference object (the
  * BpeCount/LmEval rule).
  */
case class FastRound(child: Expression, scale: Int) extends UnaryExpression {

  require(scale >= 0, s"fast_round supports non-negative scales, got $scale")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fast_round expects a double argument, got ${t.catalogString}")
  }

  @transient private lazy val evaluator = new FastRoundEval(scale)

  override protected def nullSafeEval(input: Any): Any =
    evaluator.eval(input.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fastRoundEval", evaluator, classOf[FastRoundEval].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override def prettyName: String = "fast_round"

  override protected def withNewChildInternal(newChild: Expression): FastRound =
    copy(child = newChild)
}

object FastRound {
  /** Column helper: bit-identical drop-in for `functions.round(c, s)` over
    * a DOUBLE column (FastRoundSpec pins the bit-equality; checkInputDataTypes
    * rejects anything else, so a decimal/float call site fails at analysis
    * instead of silently changing semantics).
    */
  def round(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(FastRound(bridge.expression(c), s))
  }
}

/** Serializable rounding core shared by interpreted eval and codegen. */
final class FastRoundEval(scale: Int) extends Serializable {

  private val pow: Double = math.pow(10.0, scale) // exact double for scale <= 22
  private val fastEligible: Boolean = scale <= 15

  def eval(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return d
    if (fastEligible) {
      val x = d * pow
      val ax = Math.abs(x)
      if (ax < 2.251799813685248e15) { // 2^51: below integer spacing
        val n = Math.floor(ax)
        val frac = ax - n
        val band = ax * 1e-14 + 1e-12
        if (frac > 0.5 + band) {
          val r = (n + 1.0) / pow
          return if (r == 0.0) 0.0 else if (d < 0.0) -r else r
        } else if (frac < 0.5 - band) {
          val r = n / pow
          return if (r == 0.0) 0.0 else if (d < 0.0) -r else r
        }
        // near-tie: fall through to the exact path
      }
    }
    exact(d)
  }

  /** The Catalyst arithmetic, verbatim. */
  private def exact(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}
