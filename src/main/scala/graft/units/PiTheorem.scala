package graft.units

import graft.expr.Rat

/** Buckingham-pi dimensionless groups — parity with `pint.pi_theorem`
  * (pint util; called by the reference at autofeat.py:153-176).
  *
  * pint builds the dims×quantities exponent matrix and takes an SVD
  * nullspace, then divides each basis vector by its minimum-absolute
  * element. We compute the same nullspace exactly (rational RREF,
  * free-variable basis) with the same min-element normalization; the one
  * genuinely unspecified piece of pint's output — the SVD's sign and, for
  * nullity > 1, the basis rotation — is replaced by a deterministic
  * convention: each group is negated if negative exponents outnumber
  * positive ones (ties keep the RREF sign). This reproduces pint's own
  * documented example (V=m/s, T=s, L=m -> {V:1, T:1, L:-1}) and the
  * reference test case (x2=m/sec, x3=min/mm -> {x2:1, x3:1},
  * tests/test_autofeat.py:139-149).
  */
object PiTheorem {

  /** Returns the dimensionless groups as (quantityName -> exponent) maps,
    * one per nullspace basis vector, in free-variable order.
    */
  def groups(quantities: Seq[(String, Dim)]): Seq[Map[String, Rat]] = {
    if (quantities.isEmpty) return Nil
    val dims: Vector[String] =
      quantities.flatMap(_._2.exps.keys).distinct.sorted.toVector
    val m = quantities.size
    if (dims.isEmpty) return Nil
    // rows = dimensions, cols = quantities
    val a: Array[Array[Rat]] = dims.toArray.map { d =>
      quantities.map(q => q._2.exps.getOrElse(d, Rat.zero)).toArray
    }
    // Gauss-Jordan to reduced row-echelon form (exact)
    val nR = a.length
    var row = 0
    val pivotCol = new Array[Int](nR)
    java.util.Arrays.fill(pivotCol, -1)
    var colI = 0
    while (colI < m && row < nR) {
      val p = (row until nR).find(r => !a(r)(colI).isZero)
      p match {
        case Some(pr) =>
          val tmp = a(row); a(row) = a(pr); a(pr) = tmp
          val inv = Rat.one / a(row)(colI)
          var j = 0
          while (j < m) { a(row)(j) = a(row)(j) * inv; j += 1 }
          var r = 0
          while (r < nR) {
            if (r != row && !a(r)(colI).isZero) {
              val f = a(r)(colI)
              var k = 0
              while (k < m) { a(r)(k) = a(r)(k) - f * a(row)(k); k += 1 }
            }
            r += 1
          }
          pivotCol(row) = colI
          row += 1
        case None => ()
      }
      colI += 1
    }
    val pivots = pivotCol.take(row).toVector
    val free = (0 until m).filterNot(pivots.contains)
    free.map { fc =>
      val v = Array.fill(m)(Rat.zero)
      v(fc) = Rat.one
      pivots.zipWithIndex.foreach { case (pc, r) => v(pc) = -a(r)(fc) }
      // pint normalization: divide by the minimum-absolute nonzero element
      val minAbs = v.filter(!_.isZero).map(_.abs).min
      var w = v.map(_ / minAbs)
      val neg = w.count(_.isNeg)
      val pos = w.count(x => !x.isZero && !x.isNeg)
      if (neg > pos) w = w.map(x => -x)
      quantities.zip(w).collect { case ((n, _), e) if !e.isZero => n -> e }.toMap
    }
  }

  /** pint.formatter defaults (sort=True, as_ratio=True, product " * ",
    * division " / ", power "{} ** {}") with spaces stripped, as the
    * reference's PT column naming does (autofeat.py:175:
    * `pint.formatter(r.items(), ...).replace(" ", "")`).
    */
  def formatGroup(g: Map[String, Rat]): String = {
    def expStr(r: Rat): String =
      if (r.isInt) r.n.toString
      else {
        val d = r.toDouble
        if (d == Math.rint(d)) d.toLong.toString else d.toString
      }
    val items = g.toSeq.sortBy(_._1)
    val pos = items.filter(_._2.signum > 0).map { case (n, e) =>
      if (e.isOne) n else s"$n**${expStr(e)}"
    }
    val neg = items.filter(_._2.signum < 0).map { case (n, e) =>
      if ((-e).isOne) n else s"$n**${expStr(-e)}"
    }
    val head = if (pos.isEmpty) "1" else pos.mkString("*")
    (head +: neg).mkString("/")
  }
}
