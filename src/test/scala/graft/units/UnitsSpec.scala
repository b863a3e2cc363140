package graft.units

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Rat

/** Unit-dimension parsing, Buckingham-pi groups, and pint-formatter naming
  * (reference autofeat.py:25-49 `_parse_units`, :153-176 `_apply_pi_theorem`).
  */
class UnitsSpec extends AnyFunSuite {

  private val L = "[length]"
  private val T = "[time]"
  private val M = "[mass]"

  test("parse: simple and compound unit strings") {
    assert(Units.parse("m") == Dim(Map(L -> Rat.one)))
    assert(Units.parse("m/sec") == Dim(Map(L -> Rat.one, T -> Rat.minusOne)))
    assert(Units.parse("min/mm") == Dim(Map(T -> Rat.one, L -> Rat.minusOne)))
    assert(Units.parse("kg*m/s**2") ==
      Dim(Map(M -> Rat.one, L -> Rat.one, T -> -Rat(2))))
    assert(Units.parse("m**2") == Dim(Map(L -> Rat(2))))
    assert(Units.parse("1/s") == Dim(Map(T -> Rat.minusOne)))
    assert(Units.parse("N") == Units.parse("kg*m/s^2"))
    assert(Units.parse("") == Dim.none)
    assert(Units.parse("dimensionless") == Dim.none)
  }

  test("parse: unknown units fall back to dimensionless (autofeat.py:44-48)") {
    intercept[IllegalArgumentException](Units.parse("blorps"))
    assert(Units.parseOrDimensionless("blorps/sec") == Dim.none)
    assert(Units.parseOrDimensionless("m/sec") == Units.parse("m/sec"))
  }

  test("pi theorem: reference test case x2=m/sec, x3=min/mm (test_autofeat.py:139-149)") {
    val g = PiTheorem.groups(Seq(
      "x2" -> Units.parse("m/sec"), "x3" -> Units.parse("min/mm")))
    assert(g == Seq(Map("x2" -> Rat.one, "x3" -> Rat.one)))
    assert(PiTheorem.formatGroup(g.head) == "x2*x3")
  }

  test("pi theorem: pint documented example V=m/s, T=s, L=m") {
    val g = PiTheorem.groups(Seq(
      "V" -> Units.parse("m/s"), "T" -> Units.parse("s"), "L" -> Units.parse("m")))
    assert(g == Seq(Map("V" -> Rat.one, "T" -> Rat.one, "L" -> Rat.minusOne)))
    // pint.formatter sorts items alphabetically (sort=True default)
    assert(PiTheorem.formatGroup(g.head) == "T*V/L")
  }

  test("pi theorem: no dimensioned quantities -> no groups; full-rank -> none") {
    assert(PiTheorem.groups(Nil).isEmpty)
    // m and s are dimensionally independent: nullspace is trivial
    assert(PiTheorem.groups(Seq("a" -> Units.parse("m"), "b" -> Units.parse("s"))).isEmpty)
  }

  test("dimensional veto tables (feateng.py:180-193 semantics)") {
    val v = Units.parse("m/s")
    assert(Units.transformUnit("exp", v).isEmpty)
    assert(Units.transformUnit("log", v).isEmpty)
    assert(Units.transformUnit("1+", v).isEmpty)
    assert(Units.transformUnit("sqrt", v) == Some(v.pow(Rat.half)))
    assert(Units.transformUnit("^2", v) == Some(v.pow(Rat(2))))
    assert(Units.transformUnit("1/", v) == Some(v.pow(Rat.minusOne)))
    assert(Units.transformUnit("abs", v) == Some(v))
    assert(Units.transformUnit("exp", Dim.none) == Some(Dim.none))
    // x+y needs equal dims; min/mm IS the same dimension as s/m
    assert(Units.combineUnit("x+y", v, Units.parse("m/s")) == Some(v))
    assert(Units.combineUnit("x+y", v.pow(Rat.minusOne), Units.parse("min/mm")) ==
      Some(v.pow(Rat.minusOne)))
    assert(Units.combineUnit("x-y", v, Dim.none).isEmpty)
    assert(Units.combineUnit("x*y", v, Units.parse("s/m")) == Some(Dim.none))
  }
}
