package graft.expr

/** Exact rational arithmetic for the symbolic feature IR. */
final case class Rat(n: BigInt, d: BigInt) extends Ordered[Rat] {
  require(d > 0, s"denominator must be positive: $n/$d")

  def +(o: Rat): Rat = Rat.make(n * o.d + o.n * d, d * o.d)
  def -(o: Rat): Rat = Rat.make(n * o.d - o.n * d, d * o.d)
  def *(o: Rat): Rat = Rat.make(n * o.n, d * o.d)
  def /(o: Rat): Rat = Rat.make(n * o.d, d * o.n)
  def unary_- : Rat = Rat(-n, d)
  def abs: Rat = Rat(n.abs, d)
  def isZero: Boolean = n == 0
  def isOne: Boolean = n == 1 && d == 1
  def isInt: Boolean = d == 1
  def isNeg: Boolean = n < 0
  def signum: Int = n.signum

  /** Exact rational root: Some(r) iff r^q == this (this > 0 or odd q). */
  def root(q: BigInt): Option[Rat] = {
    def iroot(x: BigInt): Option[BigInt] = {
      if (x < 0) return if (q % 2 == 1) iroot(-x).map(-_) else None
      if (x == 0 || x == 1) return Some(x)
      var r = BigInt(math.round(math.pow(x.doubleValue, 1.0 / q.doubleValue)))
      // correct rounding drift
      var it = 0
      while (it < 4 && r > 0) { it += 1
        val p = r.pow(q.toInt)
        if (p == x) return Some(r)
        if (p > x) r -= 1 else r += 1
      }
      if (r > 0 && r.pow(q.toInt) == x) Some(r) else None
    }
    for (rn <- iroot(n); rd <- iroot(d)) yield Rat.make(rn, rd)
  }

  def toDouble: Double = n.doubleValue / d.doubleValue

  override def compare(o: Rat): Int = (n * o.d).compare(o.n * d)
  override def toString: String = if (d == 1) n.toString else s"$n/$d"
}

object Rat {
  val zero: Rat = Rat(0, 1)
  val one: Rat = Rat(1, 1)
  val minusOne: Rat = Rat(-1, 1)
  val half: Rat = Rat(1, 2)

  def apply(n: Long): Rat = Rat(BigInt(n), BigInt(1))
  def make(n: BigInt, d: BigInt): Rat = {
    require(d != 0, "division by zero in Rat")
    val s = d.signum
    val g = n.gcd(d)
    if (g == 0) Rat(0, 1) else Rat(n * s / g, d * s / g)
  }

  /** b^e exact where possible (integer e always; rational e only when the
    * exact root exists). None when the result is irrational.
    */
  def pow(b: Rat, e: Rat): Option[Rat] = {
    if (e.isInt) {
      val k = e.n
      if (k >= 0) Some(make(b.n.pow(k.toInt), b.d.pow(k.toInt)))
      else if (b.isZero) None
      else Some(make(b.d.pow(-k.toInt), b.n.pow(-k.toInt)))
    } else {
      b.root(e.d).flatMap(r => pow(r, Rat(e.n, 1)))
    }
  }
}
