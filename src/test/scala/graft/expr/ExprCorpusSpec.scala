package graft.expr

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite

/** Replays the sympy golden corpus (tools/gen_sympy_corpus.py) against the
  * FExpr IR: same construction DAG must produce the same canonical names,
  * the same structural collisions (dedup), and the same Add-rooted flags.
  */
class ExprCorpusSpec extends AnyFunSuite {

  private case class Entry(op: String, args: Vector[String], idx: Int, isAdd: Boolean, name: String)

  private lazy val entries: Vector[Entry] = {
    val src = Source.fromInputStream(getClass.getResourceAsStream("/sympy_corpus.tsv"), "UTF-8")
    try src.getLines().map { line =>
      val parts = line.split('\t')
      Entry(parts(0), if (parts(1).isEmpty) Vector() else parts(1).split(',').toVector,
        parts(2).toInt, parts(3) == "1", parts(4))
    }.toVector
    finally src.close()
  }

  private def replay(): (Array[FExpr], Vector[(Entry, FExpr)]) = {
    val maxIdx = entries.map(_.idx).max
    val pool = new Array[FExpr](maxIdx + 1)
    val results = entries.map { e =>
      val expr: FExpr = e.op match {
        case "var" => Var(e.args.head)
        case op if F.unaryTransforms.contains(op) =>
          F.unaryTransforms(op)(pool(e.args.head.toInt))
        case op if F.binaryCombiners.contains(op) =>
          F.binaryCombiners(op)(pool(e.args(0).toInt), pool(e.args(1).toInt))
        case op => fail(s"unknown corpus op $op")
      }
      if (pool(e.idx) == null) pool(e.idx) = expr
      (e, expr)
    }
    (pool, results)
  }

  test("corpus: canonical names match sympy") {
    val (_, results) = replay()
    val mismatches = results.filter { case (e, expr) => expr.name != e.name }
    val rate = mismatches.size.toDouble / results.size
    if (mismatches.nonEmpty) {
      info(s"${mismatches.size}/${results.size} name mismatches (${(rate * 100).round}%)")
      mismatches.take(25).foreach { case (e, expr) =>
        info(s"  op=${e.op} args=${e.args.mkString(",")} sympy='${e.name}' ours='${expr.name}'")
      }
    }
    assert(mismatches.isEmpty, s"${mismatches.size} of ${results.size} canonical names differ from sympy")
  }

  test("corpus: structural collisions (dedup identity) match sympy") {
    val (pool, results) = replay()
    // two corpus entries share idx iff sympy considered them identical;
    // our exprs must collide in exactly the same way
    results.foreach { case (e, expr) =>
      assert(expr == pool(e.idx),
        s"op=${e.op}(${e.args.mkString(",")}) should equal pool[${e.idx}] " +
          s"(sympy '${e.name}') but got '${expr.name}'")
    }
    // and entries with different idx must NOT be structurally equal
    val byIdx = results.map { case (e, ex) => (e.idx, ex) }.distinct
    val seen = scala.collection.mutable.HashMap[FExpr, Int]()
    byIdx.foreach { case (idx, ex) =>
      seen.get(ex) match {
        case Some(other) => assert(other == idx, s"false collision: '${ex.name}' built for idx $idx and $other")
        case None        => seen(ex) = idx
      }
    }
  }

  test("corpus: Add-rooted flags match (final structural pruning input)") {
    val (_, results) = replay()
    results.foreach { case (e, expr) =>
      assert(expr.isAddRooted == e.isAdd, s"'${e.name}': isAdd sympy=${e.isAdd} ours=${expr.isAddRooted}")
    }
  }
}
