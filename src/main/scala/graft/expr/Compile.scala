package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compile an FExpr to a Catalyst Column (pure built-ins => whole-stage
  * codegen eligible; zero UDFs, matching SURVEY.md §4.2).
  *
  * Arithmetic is done in DoubleType; the fit path casts the result to float
  * to reproduce the reference's float32 working matrix (feateng.py:145).
  */
object Compile {

  def toColumn(e: FExpr, resolve: String => Column): Column = {
    def rec(x: FExpr): Column = x match {
      case Num(r)   => lit(r.toDouble)
      case Var(s)   => resolve(s)
      case Add(as)  => as.map(rec).reduce(_ + _)
      case Mul(as)  => as.map(rec).reduce(_ * _)
      case Pow(b, Num(q)) =>
        if (q == Rat(2))           { val c = rec(b); c * c }
        else if (q == Rat(3))      { val c = rec(b); c * c * c }
        else if (q == Rat.minusOne) lit(1.0) / rec(b)
        else if (q == Rat.half)     sqrt(rec(b))
        else if (q == Rat(-2))     { val c = rec(b); lit(1.0) / (c * c) }
        else pow(rec(b), lit(q.toDouble))
      case Pow(b, ex)     => pow(rec(b), rec(ex))
      case Fn(Fk.Exp, a)  => exp(rec(a))
      case Fn(Fk.Log, a)  => log(rec(a))
      case Fn(Fk.Sin, a)  => sin(rec(a))
      case Fn(Fk.Cos, a)  => cos(rec(a))
      case Fn(Fk.Abs, a)  => abs(rec(a))
    }
    rec(e)
  }

  /** Transform-path column: NaN on any row where any source is null/NaN
    * (reference autofeat.py:221-233), else the double-precision value.
    */
  def toColumnNanMasked(e: FExpr, resolve: String => Column): Column = {
    val srcs = e.vars.toSeq.map(resolve)
    val anyBad = srcs
      .map(c => c.isNull || isnan(c))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    when(anyBad, lit(Double.NaN)).otherwise(toColumn(e, resolve))
  }
}
