package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Fused keep-predicate of the cap-free IVF near-dup pair join (see
  * [[graft.pipeline.Similarity.ivfNearDupPairs]]): for a within-cluster
  * candidate row-pair carrying (current cluster, both ids, both probe
  * lists), returns true iff `id1 < id2` AND the current cluster is the
  * pair's OWNER — the element of `ps1 ∩ ps2` (collected in ps1 order) at
  * index `mix64(id1, id2) mod |ps1 ∩ ps2|`.
  *
  * Keeping a candidate pair only in its owner cluster makes each
  * qualifying pair survive EXACTLY ONCE across all its shared clusters,
  * so the downstream cosine + round is paid once per pair instead of once
  * per shared cluster (nProbe-fold in recall-1 oracle configs) and the
  * `distinct()` disappears. The emitted pair SET is unchanged: every
  * shared-probe pair has exactly one owner, and that owner is one of the
  * clusters whose join enumerates the pair. The hash-picked owner (not
  * `min(shared)`) spreads ownership uniformly: at recall-1 every vector
  * probes every cluster and a min rule would funnel ALL pair scoring into
  * cluster 0's task.
  *
  * Fused into ONE expression because it sits in the JOIN condition and is
  * evaluated once per enumerated candidate (quadratic per cluster): the
  * two O(|ps|²) scans (count shared, then walk to the picked index) touch
  * ≤ 8-entry int arrays with ZERO allocation, and the id comparison
  * short-circuits before any array work. Probe lists are distinct by
  * construction (IvfProbe/IvfProbe2 emit top-n distinct indices).
  *
  * Null semantics: any null input → false (a null vector never produces a
  * probed row, so this is unreachable in practice but must not throw).
  *
  * Codegen'd (the join stage stays in whole-stage codegen) via an
  * INSTANCE method on a reference object — the BpeCount/LmEval rule: a
  * companion-object helper would compile against a missing static
  * forwarder and silently de-codegen the stage.
  */
case class ProbePairKeep(cluster: Expression, id1: Expression, id2: Expression,
                         ps1: Expression, ps2: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(cluster, id1, id2, ps1, ps2)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(t: DataType) = t == LongType || t == IntegerType
    def intArray(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (cluster.dataType == IntegerType && integral(id1.dataType) &&
        integral(id2.dataType) && intArray(ps1.dataType) && intArray(ps2.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "probe_pair_keep expects (int, int|bigint, int|bigint, array<int>, array<int>), got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
  }

  @transient private lazy val evaluator = new ProbePairKeepEval

  override def eval(input: InternalRow): Any = {
    val i1 = id1.eval(input)
    val i2 = id2.eval(input)
    if (i1 == null || i2 == null) return false
    val c = cluster.eval(input)
    val x0 = ps1.eval(input)
    val y0 = ps2.eval(input)
    if (c == null || x0 == null || y0 == null) return false
    evaluator.eval(c.asInstanceOf[Int],
      i1.asInstanceOf[Number].longValue(), i2.asInstanceOf[Number].longValue(),
      x0.asInstanceOf[ArrayData], y0.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probePairKeepEval", evaluator,
      classOf[ProbePairKeepEval].getName)
    val cEv = cluster.genCode(ctx)
    val aEv = id1.genCode(ctx)
    val bEv = id2.genCode(ctx)
    val xEv = ps1.genCode(ctx)
    val yEv = ps2.genCode(ctx)
    val anyNull = Seq(cEv, aEv, bEv, xEv, yEv).map(_.isNull)
      .filterNot(_ == FalseLiteral).map(n => s"$n").mkString(" || ")
    val nullGuard = if (anyNull.isEmpty) "true" else s"!($anyNull)"
    val code =
      code"""
        |${cEv.code}
        |${aEv.code}
        |${bEv.code}
        |${xEv.code}
        |${yEv.code}
        |boolean ${ev.value} = false;
        |if ($nullGuard) {
        |  ${ev.value} = $ref.eval(${cEv.value}, (long) ${aEv.value}, (long) ${bEv.value},
        |    ${xEv.value}, ${yEv.value});
        |}
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ProbePairKeep =
    copy(cluster = newChildren(0), id1 = newChildren(1), id2 = newChildren(2),
      ps1 = newChildren(3), ps2 = newChildren(4))
}

/** Serializable keep-predicate core shared by interpreted eval and codegen
  * (instance methods only — the BpeCount/LmEval codegen rule).
  */
final class ProbePairKeepEval extends Serializable {

  /** splitmix64 finalizer — any deterministic 64-bit mix works; the choice
    * only balances WHICH shared cluster scores a pair, never the result set.
    */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30
    z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27
    z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def eval(cc: Int, a: Long, b: Long, x: ArrayData, y: ArrayData): Boolean = {
    if (a >= b) return false
    val nx = x.numElements()
    val ny = y.numElements()
    // pass 1: count shared entries (ps1 order)
    var m = 0
    var i = 0
    while (i < nx) {
      val v = x.getInt(i)
      var j = 0
      var found = false
      while (j < ny && !found) {
        if (y.getInt(j) == v) found = true
        j += 1
      }
      if (found) m += 1
      i += 1
    }
    if (m == 0) return false
    val pick = java.lang.Math.floorMod(mix64(a ^ mix64(b)), m.toLong).toInt
    // pass 2: walk to the pick-th shared entry
    var seen = 0
    i = 0
    while (i < nx) {
      val v = x.getInt(i)
      var j = 0
      var found = false
      while (j < ny && !found) {
        if (y.getInt(j) == v) found = true
        j += 1
      }
      if (found) {
        if (seen == pick) return v == cc
        seen += 1
      }
      i += 1
    }
    false // unreachable: pick < m
  }
}
