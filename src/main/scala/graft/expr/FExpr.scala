package graft.expr

/** Symbolic feature-expression IR with sympy-compatible canonicalization.
  *
  * The reference engine names and dedups engineered features by the canonical
  * string of the sympy expression that generates them
  * (/root/reference/src/autofeat/feateng.py:239-243, 311-313), relying on
  * sympy's *automatic* simplifications (Add/Mul flattening and like-term
  * collection, rational-power merging, sqrt(x^2)->|x|, exp/log inverses, ...).
  * Catalyst's CSE dedups identical trees only, so feature-set membership
  * parity requires our own canonical IR; this file replicates the subset of
  * sympy's auto-simplification rules reachable from the reference's 13 unary
  * transforms and 4 binary combiners over real symbols (verified against a
  * golden corpus generated from sympy itself — see ExprCorpusSpec).
  *
  * All constructions must go through the smart constructors in [[F]].
  */
sealed trait FExpr {
  /** Canonical name (sympy str-printer compatible). */
  lazy val name: String = Printer.print(this)
  /** Source variable names referenced by this expression. */
  lazy val vars: Set[String] = this match {
    case Num(_)     => Set.empty
    case Var(s)     => Set(s)
    case Add(as)    => as.flatMap(_.vars).toSet
    case Mul(as)    => as.flatMap(_.vars).toSet
    case Pow(b, e)  => b.vars ++ e.vars
    case Fn(_, a)   => a.vars
  }
  def isAddRooted: Boolean = this.isInstanceOf[Add]
  override def toString: String = name
}

final case class Num(r: Rat) extends FExpr
final case class Var(sym: String) extends FExpr
/** Canonical: >=2 args, at most one Num, terms collected, sorted by SortKey. */
final case class Add(args: Vector[FExpr]) extends FExpr
/** Canonical: >=2 args, numeric coefficient first if != 1, factors gathered. */
final case class Mul(args: Vector[FExpr]) extends FExpr
final case class Pow(base: FExpr, exp: FExpr) extends FExpr
final case class Fn(kind: Fk, arg: FExpr) extends FExpr

sealed abstract class Fk(val fname: String)
object Fk {
  case object Exp extends Fk("exp")
  case object Log extends Fk("log")
  case object Sin extends Fk("sin")
  case object Cos extends Fk("cos")
  case object Abs extends Fk("Abs")
}

object F {
  val zero: FExpr = Num(Rat.zero)
  val one: FExpr = Num(Rat.one)
  def num(n: Long): FExpr = Num(Rat(n))

  /** term = coeff * core (core has no numeric coefficient). */
  def asCoeffMul(e: FExpr): (Rat, FExpr) = e match {
    case Num(r) => (r, one)
    case Mul(args) =>
      args.head match {
        case Num(r) =>
          val rest = args.tail
          (r, if (rest.size == 1) rest.head else Mul(rest))
        case _ => (Rat.one, e)
      }
    case _ => (Rat.one, e)
  }

  private def asBaseExp(e: FExpr): (FExpr, FExpr) = e match {
    case Pow(b, ex) => (b, ex)
    case _          => (e, one)
  }

  /** Known strictly-positive (conservative; used for power merging). */
  def isPositive(e: FExpr): Boolean = e match {
    case Num(r)        => r.signum > 0
    case Fn(Fk.Exp, _) => true
    case Pow(b, _)     => isPositive(b)
    case _             => false
  }

  /** Known non-negative (used by Abs). */
  def isNonNeg(e: FExpr): Boolean = e match {
    case Num(r)          => r.signum >= 0
    case Fn(Fk.Exp, _)   => true
    case Fn(Fk.Abs, _)   => true
    case Pow(b, Num(q))  => isNonNeg(b) || (q.isInt && q.n.testBit(0) == false)
    case Pow(b, _)       => isNonNeg(b)
    case Mul(as)         => as.forall(isNonNeg)
    case Add(as)         => as.forall(isNonNeg)
    case _               => false
  }

  /** sympy Expr.could_extract_minus_sign. */
  def couldExtractMinus(e: FExpr): Boolean = e match {
    case Num(r)    => r.isNeg
    case Mul(args) => args.head match { case Num(r) => r.isNeg; case _ => false }
    case Add(args) =>
      val negs = args.count(couldExtractMinus)
      val pos = args.size - negs
      if (pos != negs) pos < negs
      else SortKey.compare(SortKey(e), SortKey(neg(e))) < 0
    case _ => false
  }

  def neg(e: FExpr): FExpr = mul(num(-1), e)

  // ---------------------------------------------------------------- Add

  def add(args: FExpr*): FExpr = addAll(args.toVector)

  def addAll(raw: Vector[FExpr]): FExpr = {
    val flat = raw.flatMap { case Add(as) => as; case x => Vector(x) }
    var const = Rat.zero
    // collect like terms by structural core, preserving first-seen order
    val order = scala.collection.mutable.ArrayBuffer[FExpr]()
    val coeffs = scala.collection.mutable.LinkedHashMap[FExpr, Rat]()
    flat.foreach {
      case Num(r) => const = const + r
      case t =>
        val (c, core) = asCoeffMul(t)
        coeffs.get(core) match {
          case Some(c0) => coeffs(core) = c0 + c
          case None     => coeffs(core) = c; order += core
        }
    }
    val terms = order.toVector.flatMap { core =>
      val c = coeffs(core)
      if (c.isZero) None
      else if (c.isOne) Some(core)
      else Some(mul(Num(c), core))
    }
    if (terms.isEmpty) Num(const)
    else if (const.isZero && terms.size == 1) terms.head
    else {
      val all = (if (const.isZero) terms else Num(const) +: terms)
        .sortWith((a, b) => SortKey.compare(SortKey(a), SortKey(b)) < 0)
      Add(all)
    }
  }

  def sub(a: FExpr, b: FExpr): FExpr = add(a, neg(b))

  // ---------------------------------------------------------------- Mul

  /** Marker base for exp-as-E^x gathering. */
  private case object ExpBase extends FExpr

  def mul(args: FExpr*): FExpr = mulAll(args.toVector)

  def mulAll(raw: Vector[FExpr]): FExpr = {
    def flat(v: Vector[FExpr]): Vector[FExpr] =
      v.flatMap { case Mul(as) => as; case x => Vector(x) }
    var coeff = Rat.one
    var factors = flat(raw)
    var iter = 0
    var changed = true
    while (changed && iter < 6) {
      iter += 1
      // fold numeric factors into the coefficient
      val fs = Vector.newBuilder[FExpr]
      factors.foreach { case Num(r) => coeff = coeff * r; case f => fs += f }
      val nonNum = fs.result()
      if (coeff.isZero) return Num(Rat.zero)
      // gather exponents of common (base, exp-core) pairs (sympy Mul.flatten)
      val order = scala.collection.mutable.ArrayBuffer[(FExpr, FExpr)]()
      val sums = scala.collection.mutable.LinkedHashMap[(FExpr, FExpr), Rat]()
      nonNum.foreach { f =>
        val (b0, e0) = f match {
          case Fn(Fk.Exp, u) => (ExpBase: FExpr, u)
          case Pow(b, e)     => (b, e)
          case other         => (other, one)
        }
        val (c, t) = asCoeffMul(e0)
        val key = (b0, t)
        sums.get(key) match {
          case Some(c0) => sums(key) = c0 + c
          case None     => sums(key) = c; order += key
        }
      }
      val rebuilt = order.toVector.map { case key @ (b0, t) =>
        val c = sums(key)
        val eTot: FExpr =
          if (t == one) Num(c)
          else if (c.isOne) t
          else mul(Num(c), t)
        b0 match {
          case ExpBase => exp(eTot)
          case b       => pow(b, eTot)
        }
      }
      val next = flat(rebuilt)
      changed = next != nonNum
      factors = next
    }
    // combine numeric bases with identical symbolic/rational exponent:
    // 2**x * 3**x -> 6**x ; sqrt(2)*sqrt(3) -> sqrt(6)
    val (numPows, rest) = factors.partition {
      case Pow(Num(_), _) => true
      case _              => false
    }
    if (numPows.size > 1) {
      val grouped = numPows
        .collect { case Pow(Num(b), e) => (e, b) }
        .groupBy(_._1)
        .toVector
        .map { case (e, bs) => pow(Num(bs.map(_._2).reduce(_ * _)), e) }
      factors = rest ++ grouped.flatMap {
        case Num(r) => coeff = coeff * r; None
        case f      => Some(f)
      }
    }
    // distribute a non-1 numeric coefficient into a sole Add factor
    if (!coeff.isOne && factors.size == 1) factors.head match {
      case Add(as) => return addAll(as.map(t => mul(Num(coeff), t)))
      case _       => ()
    }
    if (factors.isEmpty) Num(coeff)
    else if (coeff.isOne && factors.size == 1) factors.head
    else {
      val sorted = factors.sortWith((a, b) => SortKey.compare(SortKey(a), SortKey(b)) < 0)
      Mul(if (coeff.isOne) sorted else Num(coeff) +: sorted)
    }
  }

  /** Product construction WITHOUT base-exponent gathering. Used by the
    * rational-power-of-Mul distribution only: numeric factors still fold
    * into the coefficient and factors sort canonically, but factors with a
    * common base are NOT merged (mirrors sympy, where the distributed Pows
    * are built with evaluate=False). A later mul()/pow() over the result
    * re-gathers, exactly like sympy's evaluated Mul would.
    */
  private def mulNoGather(raw: Vector[FExpr]): FExpr = {
    val flat = raw.flatMap { case Mul(as) => as; case x => Vector(x) }
    var coeff = Rat.one
    val fs = Vector.newBuilder[FExpr]
    flat.foreach { case Num(r) => coeff = coeff * r; case f => fs += f }
    val factors = fs.result()
    if (coeff.isZero) Num(Rat.zero)
    else if (factors.isEmpty) Num(coeff)
    else if (coeff.isOne && factors.size == 1) factors.head
    else if (!coeff.isOne && factors.size == 1 && factors.head.isInstanceOf[Add])
      addAll(factors.head.asInstanceOf[Add].args.map(t => mul(Num(coeff), t)))
    else {
      val sorted = factors.sortWith((a, b) => SortKey.compare(SortKey(a), SortKey(b)) < 0)
      Mul(if (coeff.isOne) sorted else Num(coeff) +: sorted)
    }
  }

  // ---------------------------------------------------------------- Pow

  def pow(b: FExpr, e: FExpr): FExpr = (b, e) match {
    case (_, Num(q)) if q.isZero => one
    case (_, Num(q)) if q.isOne  => b
    case (Num(r), _) if r.isOne  => one
    case (Num(r), Num(q)) =>
      Rat.pow(r, q) match {
        case Some(v) => Num(v)
        case None =>
          // split off the integer part of a >1 rational exponent (sympy
          // pnum_rat handling); keep negative/unit-interval exponents as-is
          if (!q.isInt && q > Rat.one && r.signum > 0) {
            val i = q.n / q.d
            val frac = q - Rat(i, 1)
            mul(Num(Rat.pow(r, Rat(i, 1)).get), Pow(Num(r), Num(frac)))
          } else Pow(b, e)
      }
    case (_, Num(q)) =>
      b match {
        case Pow(b2, Num(a)) if q.isInt            => pow(b2, Num(a * q))
        case Pow(b2, Num(a)) if a.isInt && !a.n.testBit(0) =>
          pow(abs(b2), Num(a * q)) // (u^even)^(p/q) -> |u|^(even*p/q)
        case Pow(b2, Num(a)) if a.abs < Rat.one    => pow(b2, Num(a * q))
        case Pow(b2, Num(a)) if isPositive(b2)     => pow(b2, Num(a * q))
        case Pow(b2, e2) if isPositive(b2)         => pow(b2, mul(Num(q), e2))
        case Fn(Fk.Exp, u)                         => exp(mul(Num(q), u))
        case Fn(Fk.Abs, u) if q.isInt && !q.n.testBit(0) => pow(u, Num(q))
        case Fn(Fk.Abs, u) if q.isInt && q.n.testBit(0) && q.n.abs != 1 =>
          mul(pow(u, Num(q - Rat.one)), Fn(Fk.Abs, u))
        case Mul(as) if q.isInt                    => mulAll(as.map(f => pow(f, Num(q))))
        case Mul(as) =>
          // rational power of a product: extract the "safe" factors
          def safe(f: FExpr): Boolean = f match {
            case Num(r)         => r.signum > 0
            case Fn(Fk.Exp, _)  => true
            case Fn(Fk.Abs, _)  => true
            case Pow(_, Num(a)) => a.isInt && !a.n.testBit(0)
            case Pow(b2, _)     => isPositive(b2)
            case _              => false
          }
          val (out, in) = as.partition(safe)
          if (out.isEmpty) Pow(b, e)
          else {
            val inner = in.size match {
              case 0 => one
              case 1 => pow(in.head, Num(q))
              case _ => Pow(Mul(in), Num(q)) // raw: nothing left to extract
            }
            // sympy's expand_power_base builds the distributed product from
            // evaluate=False Pows, so same-base factors created BY the
            // distribution are not re-gathered: sqrt(x**2*Abs(x)) stays
            // sqrt(Abs(x))*Abs(x), not Abs(x)**(3/2)
            mulNoGather(out.map(f => pow(f, Num(q))) :+ inner)
          }
        case _ => Pow(b, e)
      }
    case _ => Pow(b, e) // symbolic exponent (2**x style)
  }

  def sqrt(e: FExpr): FExpr = pow(e, Num(Rat.half))
  def recip(e: FExpr): FExpr = pow(e, num(-1))
  def sq(e: FExpr): FExpr = pow(e, num(2))
  def cube(e: FExpr): FExpr = pow(e, num(3))
  def twoPow(e: FExpr): FExpr = pow(num(2), e)

  // ---------------------------------------------------------------- funcs

  def exp(u: FExpr): FExpr = u match {
    case Num(r) if r.isZero => one
    case Fn(Fk.Log, v)      => v
    case Add(terms) =>
      // exp pulls c*log(v) terms out of an Add argument (sympy exp.eval)
      val out = Vector.newBuilder[FExpr]
      val keep = Vector.newBuilder[FExpr]
      terms.foreach { t =>
        val (c, core) = asCoeffMul(t)
        core match {
          case Fn(Fk.Log, v) => out += pow(v, Num(c))
          case _             => keep += t
        }
      }
      val o = out.result()
      if (o.isEmpty) Fn(Fk.Exp, u)
      else {
        val rest = keep.result()
        if (rest.isEmpty) mulAll(o)
        else mulAll(o :+ Fn(Fk.Exp, addAll(rest)))
      }
    case _ =>
      val (c, core) = asCoeffMul(u)
      core match {
        case Fn(Fk.Log, v) if !c.isOne => pow(v, Num(c))
        case _                         => Fn(Fk.Exp, u)
      }
  }

  def log(u: FExpr): FExpr = u match {
    case Num(r) if r.isOne => zero
    case Fn(Fk.Exp, v)     => v
    case _                 => Fn(Fk.Log, u)
  }

  /** (numerator, denominator) split, sympy as_numer_denom (no Add handling). */
  private def asNumerDenom(e: FExpr): (FExpr, FExpr) = e match {
    case Num(r) if r.d != 1 => (Num(Rat(r.n, 1)), Num(Rat(r.d, 1)))
    case Pow(b, Num(q)) if q.isNeg => (one, pow(b, Num(-q)))
    case Mul(as) =>
      val parts = as.map(asNumerDenom)
      (mulAll(parts.map(_._1)), mulAll(parts.map(_._2)))
    case _ => (e, one)
  }

  def abs(u: FExpr): FExpr = u match {
    case Num(r)              => Num(r.abs)
    case _ if isNonNeg(u)    => u
    case _ if couldExtractMinus(u) => abs(neg(u))
    case _ =>
      // sympy Abs.eval: |n/d| = |n|/|d| when the numerator is symbol-free
      val (n, d) = asNumerDenom(u)
      if (d != one && d.vars.nonEmpty && n.vars.isEmpty)
        return mul(abs(n), recip(abs(d)))
      u match {
        case Pow(b, Num(q)) if q.isInt => pow(abs(b), Num(q)) // odd (even => nonneg)
        case Mul(as) =>
          // known-sign factors distribute out; unknown-sign factors stay
          // grouped under ONE unevaluated Abs (sympy Abs.eval Mul branch,
          // including the Pow-with-negative-int-exponent special case)
          val known = Vector.newBuilder[FExpr]
          val unknown = Vector.newBuilder[FExpr]
          as.foreach {
            case t @ Pow(b, Num(q)) if q.isInt && q.isNeg =>
              abs(b) match {
                case Fn(Fk.Abs, _) => unknown += t
                case bnew          => known += pow(bnew, Num(q))
              }
            case t =>
              abs(t) match {
                case Fn(Fk.Abs, _) => unknown += t
                case tnew          => known += tnew
              }
          }
          val unk = unknown.result()
          val kn = known.result()
          if (unk.size == as.size) Fn(Fk.Abs, u)
          else if (unk.isEmpty) mulAll(kn)
          else mulAll(kn :+ Fn(Fk.Abs, mulAll(unk)))
        case _ => Fn(Fk.Abs, u)
      }
  }

  def sin(u: FExpr): FExpr = u match {
    case Num(r) if r.isZero        => zero
    case _ if couldExtractMinus(u) => neg(sin(neg(u)))
    case _                         => Fn(Fk.Sin, u)
  }

  def cos(u: FExpr): FExpr = u match {
    case Num(r) if r.isZero        => one
    case _ if couldExtractMinus(u) => cos(neg(u))
    case _                         => Fn(Fk.Cos, u)
  }

  // ------------------------------------------------- reference op tables

  /** The reference's 13 unary transforms (feateng.py:164-177). */
  val unaryTransforms: Map[String, FExpr => FExpr] = Map(
    "1/"   -> recip,
    "exp"  -> exp,
    "exp-" -> ((e: FExpr) => exp(neg(e))),
    "log"  -> log,
    "abs"  -> abs,
    "sqrt" -> sqrt,
    "sin"  -> sin,
    "cos"  -> cos,
    "2^"   -> twoPow,
    "^2"   -> sq,
    "^3"   -> cube,
    "1+"   -> ((e: FExpr) => add(one, e)),
    "1-"   -> ((e: FExpr) => add(one, neg(e)))
  )

  /** The reference's 4 binary combiners (feateng.py:287-290). */
  val binaryCombiners: Map[String, (FExpr, FExpr) => FExpr] = Map(
    "x+y" -> ((a: FExpr, b: FExpr) => add(a, b)),
    "x*y" -> ((a: FExpr, b: FExpr) => mul(a, b)),
    "x-y" -> ((a: FExpr, b: FExpr) => sub(a, b)),
    "y-x" -> ((a: FExpr, b: FExpr) => sub(b, a))
  )

  /** Sanitize a raw column name into a symbol (feateng.py:24-34). */
  def colToSymbol(c: String, i: Int): String = {
    var s = c.replaceAll("\\W+", "")
    if (s.isEmpty) s = f"x$i%03d"
    else if (s.head.isDigit) s = "x" + s
    s
  }
}
