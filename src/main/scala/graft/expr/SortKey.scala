package graft.expr

/** Replica of sympy's default_sort_key / Basic.sort_key for our expression
  * universe. Keys are heterogeneous nested tuples compared lexicographically.
  */
sealed trait SK
final case class SKInt(v: Int) extends SK
final case class SKRat(v: Rat) extends SK
final case class SKStr(v: String) extends SK
final case class SKTup(items: Vector[SK]) extends SK

object SortKey {

  def compare(a: SK, b: SK): Int = (a, b) match {
    case (SKInt(x), SKInt(y))   => x.compare(y)
    case (SKInt(x), SKRat(y))   => Rat(x.toLong).compare(y)
    case (SKRat(x), SKInt(y))   => x.compare(Rat(y.toLong))
    case (SKRat(x), SKRat(y))   => x.compare(y)
    case (SKStr(x), SKStr(y))   => x.compare(y)
    case (SKTup(x), SKTup(y)) =>
      val n = math.min(x.size, y.size)
      var i = 0
      while (i < n) {
        val c = compare(x(i), y(i))
        if (c != 0) return c
        i += 1
      }
      x.size.compare(y.size)
    // mixed kinds should not occur at the same slot; order by kind rank
    case _ => rank(a).compare(rank(b))
  }

  private def rank(k: SK): Int = k match {
    case _: SKInt => 0; case _: SKRat => 0; case _: SKStr => 1; case _: SKTup => 2
  }

  private def tup(items: SK*): SK = SKTup(items.toVector)

  /** sympy class_key() triples for the classes in our universe. */
  private def classKey(e: FExpr): SK = e match {
    case _: Num         => tup(SKInt(1), SKInt(0), SKStr("Number"))
    case _: Var         => tup(SKInt(2), SKInt(0), SKStr("Symbol"))
    case _: Mul         => tup(SKInt(3), SKInt(0), SKStr("Mul"))
    case _: Add         => tup(SKInt(3), SKInt(1), SKStr("Add"))
    case _: Pow         => tup(SKInt(3), SKInt(2), SKStr("Pow"))
    case Fn(Fk.Exp, _)  => tup(SKInt(4), SKInt(10), SKStr("exp"))
    case Fn(Fk.Log, _)  => tup(SKInt(4), SKInt(11), SKStr("log"))
    case Fn(Fk.Sin, _)  => tup(SKInt(4), SKInt(20), SKStr("sin"))
    case Fn(Fk.Cos, _)  => tup(SKInt(4), SKInt(21), SKStr("cos"))
    case Fn(Fk.Abs, _)  => tup(SKInt(4), SKInt(10000), SKStr("Abs"))
  }

  /** Number.sort_key(): (class, (0, ()), (), value). */
  private def numKey(r: Rat): SK =
    tup(tup(SKInt(1), SKInt(0), SKStr("Number")), tup(SKInt(0), SKTup(Vector())),
        SKTup(Vector()), SKRat(r))

  def apply(e: FExpr): SK = e match {
    case Num(r) => numKey(r)
    case _ =>
      val (coeff, rest) = F.asCoeffMul(e)
      val (base, expE) = rest match {
        case Pow(b, ex) => (b, ex)
        case other      => (other, F.one)
      }
      val argsK: SK = base match {
        case Num(r) => tup(SKInt(1), SKTup(Vector(SKStr(r.toString))))
        case Var(s) => tup(SKInt(1), SKTup(Vector(SKStr(s))))
        case ad: Add =>
          val ts = Printer.orderedTerms(ad)
          tup(SKInt(ts.size), SKTup(ts.map(apply).toVector))
        case Mul(as) => tup(SKInt(as.size), SKTup(as.map(apply)))
        case Fn(_, a) => tup(SKInt(1), SKTup(Vector(apply(a))))
        case Pow(b2, e2) => tup(SKInt(2), SKTup(Vector(apply(b2), apply(e2))))
      }
      val expK: SK = expE match {
        case Num(r) => numKey(r)
        case other  => apply(other)
      }
      tup(classKey(base), argsK, expK, SKRat(coeff))
  }

  val ordering: Ordering[FExpr] = (a: FExpr, b: FExpr) => compare(apply(a), apply(b))
}
