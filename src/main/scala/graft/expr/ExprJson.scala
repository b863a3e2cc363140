package graft.expr

/** Structural JSON serde for FExpr — the persisted model artifact stores
  * formulas structurally (not by re-parsing canonical names).
  * Format: ["n","p/q"] | ["v","sym"] | ["+",...] | ["*",...] |
  *         ["^",b,e] | ["f","exp",arg]
  */
object ExprJson {

  def toJson(e: FExpr): String = e match {
    case Num(r)    => s"""["n","${r.n}/${r.d}"]"""
    case Var(s)    => s"""["v",${quote(s)}]"""
    case Add(as)   => as.map(toJson).mkString("""["+",""", ",", "]")
    case Mul(as)   => as.map(toJson).mkString("""["*",""", ",", "]")
    case Pow(b, x) => s"""["^",${toJson(b)},${toJson(x)}]"""
    case Fn(k, a)  => s"""["f",${quote(k.fname)},${toJson(a)}]"""
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def fromJson(s: String): FExpr = new P(s).parseExpr()

  /** Tiny recursive-descent parser for the array format above. */
  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = { ws(); require(s(i) == c, s"expected $c at $i in $s"); i += 1 }
    private def parseString(): String = {
      ws(); expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c   => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    def parseExpr(): FExpr = {
      expect('[')
      val tag = parseString()
      val out = tag match {
        case "n" =>
          expect(',')
          val Array(n, d) = parseString().split('/')
          Num(Rat.make(BigInt(n), BigInt(d)))
        case "v" => expect(','); Var(parseString())
        case "+" | "*" =>
          val args = Vector.newBuilder[FExpr]
          ws()
          while (s(i) == ',') { i += 1; args += parseExpr() }
          val as = args.result()
          // rebuild through raw constructors: stored form is already canonical
          if (tag == "+") Add(as) else Mul(as)
        case "^" =>
          expect(','); val b = parseExpr(); expect(','); val e = parseExpr(); Pow(b, e)
        case "f" =>
          expect(','); val name = parseString(); expect(','); val a = parseExpr()
          val k = name match {
            case "exp" => Fk.Exp; case "log" => Fk.Log; case "sin" => Fk.Sin
            case "cos" => Fk.Cos; case "Abs" => Fk.Abs
          }
          Fn(k, a)
      }
      expect(']')
      out
    }
  }
}
