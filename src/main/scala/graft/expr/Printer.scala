package graft.expr

/** sympy StrPrinter-compatible canonical printing for FExpr. */
object Printer {

  private val PREC_ADD = 40
  private val PREC_MUL = 50
  private val PREC_POW = 60
  private val PREC_ATOM = 100

  private def prec(e: FExpr): Int = e match {
    case Add(_) => PREC_ADD
    case Mul(args) =>
      // a leading negative coefficient prints with a '-' sign -> Add precedence
      args.head match {
        case Num(r) if r.isNeg => PREC_ADD
        case _                 => PREC_MUL
      }
    case Pow(_, _)      => PREC_POW
    case Num(r) if r.isNeg => PREC_ADD
    case Num(r) if !r.isInt => PREC_MUL // printed as p/q
    case _              => PREC_ATOM
  }

  private def paren(e: FExpr, outerPrec: Int): String = {
    val s = print(e)
    if (prec(e) < outerPrec) s"($s)" else s
  }

  def print(e: FExpr): String = e match {
    case Num(r)            => r.toString
    case Var(s)            => s
    case Fn(Fk.Exp, Num(r)) if r.isOne => "E"
    case Fn(k, a)          => s"${k.fname}(${print(a)})"
    case p: Pow            => printPow(p)
    case m: Mul            => printMul(m)
    case a: Add            => printAdd(a)
  }

  // ------------------------------------------------------------------ Pow

  private def printPow(p: Pow): String = p.exp match {
    case Num(r) if r == Rat.half       => s"sqrt(${print(p.base)})"
    case Num(r) if r == -Rat.half      => s"1/sqrt(${print(p.base)})"
    case Num(r) if r == Rat.minusOne   => s"1/${paren(p.base, PREC_POW)}"
    case e =>
      val baseStr = p.base match {
        case _: Pow => s"(${print(p.base)})" // right-assoc ambiguity
        case b      => paren(b, PREC_POW)
      }
      val expStr = e match {
        case Num(r) if r.isInt && !r.isNeg => r.toString
        case Num(r)                        => s"(${r.toString})"
        case Var(s)                        => s
        case f: Fn                         => print(f)
        case other                         => s"(${print(other)})"
      }
      s"$baseStr**$expStr"
  }

  // ------------------------------------------------------------------ Mul

  private def printMul(m: Mul): String = {
    val (coeff, _) = F.asCoeffMul(m)
    if (coeff.isNeg) {
      val rest = F.asCoeffMul(m)._2
      val pos = if ((-coeff).isOne) rest else Mul(Num(-coeff) +: (rest match {
        case Mul(as) => as
        case other   => Vector(other)
      }))
      return "-" + print(pos)
    }
    val factors = m.args.filter(!_.isInstanceOf[Num])
    val num = scala.collection.mutable.ArrayBuffer[String]()
    val den = scala.collection.mutable.ArrayBuffer[String]()
    if (!coeff.isOne) {
      if (coeff.n != 1) num += coeff.n.toString
      if (coeff.d != 1) den += coeff.d.toString
    }
    factors.foreach {
      case Pow(b, Num(q)) if q.isNeg =>
        val negExp = -q
        if (negExp.isOne) den += paren(b, PREC_MUL)
        else if (negExp == Rat.half) den += s"sqrt(${print(b)})"
        else den += printPow(Pow(b, Num(negExp))) // e.g. x**2 in denominator
      case Pow(b, ex) if F.couldExtractMinus(ex) =>
        den += printPow(Pow(b, F.neg(ex)))
      case f => num += paren(f, PREC_MUL)
    }
    val n = if (num.isEmpty) "1" else num.mkString("*")
    if (den.isEmpty) n
    else if (den.size == 1) s"$n/${den.head}"
    else s"$n/(${den.mkString("*")})"
  }

  // ------------------------------------------------------------------ Add

  /** sympy Expr.as_ordered_terms(order=None). */
  def orderedTerms(a: Add): Seq[FExpr] = {
    // special case: Add(positive Number, negative-coefficient Mul)
    if (a.args.size == 2) {
      val (nums, others) = a.args.partition(_.isInstanceOf[Num])
      (nums, others) match {
        case (Vector(n @ Num(r)), Vector(t)) if r.signum > 0 =>
          val (c, _) = F.asCoeffMul(t)
          t match {
            case _: Mul if c.isNeg => return Seq(n, t)
            case _                 => ()
          }
        case _ => ()
      }
    }
    // as_terms(): decompose each term into coeff * prod(gen^intExp)
    def decomposePower(f: FExpr): (FExpr, Int) = {
      val (base, expE) = f match {
        case Pow(b, ex)    => (b, ex)
        case Fn(Fk.Exp, u) => (null, u) // E**u; rebuild via F.exp
        case other         => return (other, 1)
      }
      def rebuild(t: FExpr): FExpr =
        if (base == null) F.exp(t) else Pow(base, t)
      expE match {
        case Num(q) if q.isInt && q.n.isValidInt =>
          if (base == null) (f, 1) else (base, q.n.toInt)
        case Num(q) if q.n.isValidInt =>
          (rebuild(Num(Rat.make(1, q.d))), q.n.toInt)
        case e =>
          // symbolic exponent: gen = base**core, monom = rational coeff's p
          val (c, t) = F.asCoeffMul(e)
          if (c == Rat.minusOne) (rebuild(t), -1)
          else if (!c.isOne && c.n.isValidInt)
            (rebuild(if (c.d == 1) t else F.mul(Num(Rat.make(1, c.d)), t)), c.n.toInt)
          else (f, 1)
      }
    }
    val decomposed = a.args.map { t =>
      val (c, core) = F.asCoeffMul(t)
      val factors: Vector[FExpr] = core match {
        case Mul(as)          => as
        case Num(r) if r.isOne => Vector()
        case f                => Vector(f)
      }
      val powers = factors.map(decomposePower)
      (t, c, powers.toMap)
    }
    val gens = decomposed.flatMap(_._3.keys).distinct
      .sortWith((x, y) => SortKey.compare(SortKey(x), SortKey(y)) < 0)
    val keyed = decomposed.map { case (t, c, pows) =>
      val monom = gens.map(g => -pows.getOrElse(g, 0))
      (t, (monom, c.toDouble))
    }
    keyed.sortBy(_._2)(Ordering.Tuple2(
      Ordering.Implicits.seqOrdering[Vector, Int], Ordering.Double.TotalOrdering
    )).map(_._1)
  }

  private def printAdd(a: Add): String = {
    val terms = orderedTerms(a)
    val sb = new StringBuilder
    terms.zipWithIndex.foreach { case (t, i) =>
      val s = print(t)
      if (i == 0) sb ++= s
      else if (s.startsWith("-")) { sb ++= " - "; sb ++= s.drop(1) }
      else { sb ++= " + "; sb ++= s }
    }
    sb.toString
  }
}
