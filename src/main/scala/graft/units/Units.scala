package graft.units

import graft.expr.Rat

/** Dimension vector over pint's SI base dimensions — the unit model behind
  * the reference's `units=` / Buckingham-pi support (autofeat.py:25-49,
  * 153-176). The reference forces every parsed quantity's magnitude to 1.0
  * (`_parse_units`, autofeat.py:48), so ONLY dimensionality matters: a
  * minimal dimension algebra replaces the full pint registry.
  */
final case class Dim(exps: Map[String, Rat]) {
  def isDimensionless: Boolean = exps.isEmpty
  def *(o: Dim): Dim = Dim.make(
    (exps.keySet ++ o.exps.keySet).iterator.map { k =>
      k -> (exps.getOrElse(k, Rat.zero) + o.exps.getOrElse(k, Rat.zero))
    }.toMap)
  def /(o: Dim): Dim = this * o.pow(Rat.minusOne)
  def pow(q: Rat): Dim =
    if (q.isZero) Dim.none else Dim.make(exps.map { case (k, e) => k -> e * q })
  override def toString: String =
    if (isDimensionless) "dimensionless"
    else exps.toSeq.sortBy(_._1).map { case (k, e) => s"$k**$e" }.mkString(" * ")
}

object Dim {
  val none: Dim = Dim(Map.empty)
  def make(m: Map[String, Rat]): Dim = Dim(m.filterNot(_._2.isZero))
  def base(name: String): Dim = Dim(Map(name -> Rat.one))
}

/** Parse errors mirror pint.UndefinedUnitError: the caller maps the whole
  * unit string to dimensionless (reference autofeat.py:44-48).
  */
final case class UndefinedUnitException(token: String)
  extends IllegalArgumentException(s"unit '$token' is not defined")

object Units {
  private val L = Dim.base("[length]")
  private val T = Dim.base("[time]")
  private val M = Dim.base("[mass]")
  private val I = Dim.base("[current]")
  private val Th = Dim.base("[temperature]")
  private val N = Dim.base("[substance]")
  private val J = Dim.base("[luminosity]")
  private val one = Dim.none

  private def aliases(d: Dim, names: String*): Seq[(String, Dim)] = names.map(_ -> d)

  /** Common pint unit names/symbols -> dimension. Magnitudes are irrelevant
    * (see Dim doc), so prefixed forms map to the same dimension.
    */
  private val registry: Map[String, Dim] = (
    aliases(L, "m", "meter", "meters", "metre", "metres", "km", "cm", "mm", "um",
      "micrometer", "micron", "nm", "angstrom", "mile", "miles", "mi", "yard",
      "yards", "yd", "foot", "feet", "ft", "inch", "inches", "in") ++
    aliases(T, "s", "sec", "secs", "second", "seconds", "min", "minute", "minutes",
      "h", "hr", "hrs", "hour", "hours", "day", "days", "week", "weeks", "ms",
      "millisecond", "milliseconds", "us", "microsecond", "microseconds", "ns",
      "year", "years", "yr") ++
    aliases(M, "g", "gram", "grams", "kg", "kilogram", "kilograms", "mg", "ug",
      "lb", "lbs", "pound", "pounds", "tonne", "tonnes", "ton", "tons", "oz",
      "ounce", "ounces") ++
    aliases(I, "A", "amp", "amps", "ampere", "amperes", "mA") ++
    aliases(Th, "K", "kelvin", "degK", "degC", "celsius", "degF", "fahrenheit") ++
    aliases(N, "mol", "mole", "moles", "mmol") ++
    aliases(J, "cd", "candela") ++
    aliases(T.pow(Rat.minusOne), "Hz", "hertz", "kHz", "MHz", "GHz", "Bq", "becquerel") ++
    aliases(M * L / T.pow(Rat(2)), "N", "newton", "newtons", "kN") ++
    aliases(M / (L * T.pow(Rat(2))), "Pa", "pascal", "kPa", "MPa", "bar", "mbar",
      "atm", "atmosphere", "mmHg", "psi", "torr") ++
    aliases(M * L.pow(Rat(2)) / T.pow(Rat(2)), "J", "joule", "joules", "kJ", "MJ",
      "cal", "calorie", "calories", "kcal", "eV", "Wh", "kWh", "erg", "BTU", "btu") ++
    aliases(M * L.pow(Rat(2)) / T.pow(Rat(3)), "W", "watt", "watts", "kW", "MW",
      "mW", "hp", "horsepower") ++
    aliases(I * T, "C", "coulomb", "coulombs") ++
    aliases(M * L.pow(Rat(2)) / (T.pow(Rat(3)) * I), "V", "volt", "volts", "mV", "kV") ++
    aliases(M * L.pow(Rat(2)) / (T.pow(Rat(3)) * I.pow(Rat(2))), "ohm", "ohms") ++
    aliases(M.pow(Rat.minusOne) * L.pow(Rat(-2)) * T.pow(Rat(4)) * I.pow(Rat(2)),
      "F", "farad", "uF", "nF", "pF") ++
    aliases(M / (T.pow(Rat(2)) * I), "T", "tesla") ++
    aliases(L.pow(Rat(3)), "L", "l", "liter", "liters", "litre", "litres", "mL",
      "ml", "gallon", "gallons", "gal") ++
    aliases(L.pow(Rat(2)), "acre", "acres", "hectare", "hectares", "ha") ++
    aliases(L / T, "mph", "kph", "knot", "knots") ++
    aliases(one, "", "dimensionless", "count", "rad", "radian", "radians", "deg",
      "degree", "degrees", "percent", "pct", "turn", "cycle")
  ).toMap

  // ------------------------------------------------------------- parser
  // Grammar (subset of pint.parse_expression):
  //   expr   := term (('*' | '/' | '·') term)*
  //   term   := atom (('**' | '^') signed)?
  //   atom   := name | number | '(' expr ')'
  // Numbers contribute no dimension (magnitude is discarded).
  def parse(s: String): Dim = {
    val toks = tokenize(s)
    if (toks.isEmpty) return Dim.none
    var pos = 0
    def peek: String = if (pos < toks.length) toks(pos) else ""
    def next(): String = { val t = peek; pos += 1; t }
    def parseNumber(t: String): Rat = {
      val neg = t.startsWith("-")
      val body = if (neg || t.startsWith("+")) t.substring(1) else t
      val r =
        if (body.contains('.')) {
          val i = body.indexOf('.')
          val frac = body.substring(i + 1)
          val digits = BigInt(body.replace(".", ""))
          Rat.make(digits, BigInt(10).pow(frac.length))
        } else Rat(BigInt(body), BigInt(1))
      if (neg) -r else r
    }
    def atom(): Dim = {
      val t = next()
      if (t == "(") {
        val d = expr()
        require(next() == ")", s"expected ) in unit '$s'")
        d
      } else if (t.nonEmpty && (t.head.isDigit || t.head == '.' || t.head == '-' || t.head == '+')) {
        parseNumber(t); Dim.none
      } else registry.getOrElse(t, throw UndefinedUnitException(t))
    }
    def term(): Dim = {
      var d = atom()
      if (peek == "**" || peek == "^") {
        next()
        d = d.pow(parseNumber(next()))
      }
      d
    }
    def expr(): Dim = {
      var d = term()
      while (peek == "*" || peek == "/" || peek == "·") {
        val op = next()
        val rhs = term()
        d = if (op == "/") d / rhs else d * rhs
      }
      d
    }
    val out = expr()
    require(pos == toks.length, s"trailing tokens in unit '$s'")
    out
  }

  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '*') {
        if (i + 1 < s.length && s(i + 1) == '*') { out += "**"; i += 2 }
        else { out += "*"; i += 1 }
      } else if (c == '^' || c == '/' || c == '(' || c == ')' || c == '·') {
        out += c.toString; i += 1
      } else if (c.isDigit || c == '.' ||
        ((c == '-' || c == '+') && i + 1 < s.length && (s(i + 1).isDigit || s(i + 1) == '.'))) {
        val j0 = i; i += 1
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        out += s.substring(j0, i)
      } else if (c.isLetter || c == '%' || c == '_') {
        val j0 = i; i += 1
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        val t = s.substring(j0, i)
        out += (if (t == "%") "percent" else t)
      } else throw UndefinedUnitException(c.toString)
    }
    out.result()
  }

  /** `_parse_units` semantics (autofeat.py:37-49): an unparseable unit string
    * maps the column to dimensionless (with the reference this logs a
    * warning).
    */
  def parseOrDimensionless(s: String): Dim =
    try parse(s)
    catch { case _: IllegalArgumentException => Dim.none }

  // -------------------------------------------- synthesis dimensional veto
  // The reference applies each transform's numpy op to the pint quantity and
  // skips the feature on DimensionalityError (feateng.py:180-193, 245-250).
  // None = vetoed.
  def transformUnit(ft: String, d: Dim): Option[Dim] = ft match {
    case "exp" | "exp-" | "log" | "sin" | "cos" | "2^" =>
      if (d.isDimensionless) Some(Dim.none) else None
    case "1+" | "1-" =>
      if (d.isDimensionless) Some(Dim.none) else None
    case "abs"  => Some(d)
    case "sqrt" => Some(d.pow(Rat.half))
    case "^2"   => Some(d.pow(Rat(2)))
    case "^3"   => Some(d.pow(Rat(3)))
    case "1/"   => Some(d.pow(Rat.minusOne))
    case other  => throw new IllegalArgumentException(s"unknown transformation $other")
  }

  def combineUnit(fc: String, a: Dim, b: Dim): Option[Dim] = fc match {
    case "x+y" | "x-y" | "y-x" => if (a == b) Some(a) else None
    case "x*y"                 => Some(a * b)
    case other                 => throw new IllegalArgumentException(s"unknown combination $other")
  }
}
