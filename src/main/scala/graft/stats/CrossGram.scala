package graft.stats

import org.apache.spark.sql.DataFrame

/** One-pass cross-moments of two column blocks A (dA cols) and B (dB cols):
  * n, ΣA, ΣA², ΣB, ΣB², ΣA·Bᵀ. Used for the reference's final
  * correlation-vs-original-features prune (feateng.py:397-412) where the
  * full (dA+dB)² Gram would be wastefully large (dA can be thousands while
  * dB is the handful of start features). Rows with non-finite values are
  * skipped.
  */
final class CrossGram(val dA: Int, val dB: Int) extends Serializable {
  var n: Long = 0L
  val sa = new Array[Double](dA)
  val saa = new Array[Double](dA)
  val sb = new Array[Double](dB)
  val sbb = new Array[Double](dB)
  val sab = new Array[Double](dA * dB)

  def add(a: Array[Double], b: Array[Double]): this.type = {
    n += 1
    var i = 0
    while (i < dA) { sa(i) += a(i); saa(i) += a(i) * a(i); i += 1 }
    var j = 0
    while (j < dB) { sb(j) += b(j); sbb(j) += b(j) * b(j); j += 1 }
    i = 0
    while (i < dA) {
      val ai = a(i); val base = i * dB
      j = 0
      while (j < dB) { sab(base + j) += ai * b(j); j += 1 }
      i += 1
    }
    this
  }

  def merge(o: CrossGram): this.type = {
    n += o.n
    var i = 0
    while (i < dA) { sa(i) += o.sa(i); saa(i) += o.saa(i); i += 1 }
    i = 0
    while (i < dB) { sb(i) += o.sb(i); sbb(i) += o.sbb(i); i += 1 }
    i = 0
    while (i < sab.length) { sab(i) += o.sab(i); i += 1 }
    this
  }

  /** Pearson corr(A_i, B_j). */
  def corr(i: Int, j: Int): Double = {
    val ma = sa(i) / n; val mb = sb(j) / n
    val va = saa(i) / n - ma * ma
    val vb = sbb(j) / n - mb * mb
    val cov = sab(i * dB + j) / n - ma * mb
    val den = math.sqrt(math.max(0.0, va)) * math.sqrt(math.max(0.0, vb))
    if (den == 0.0) Double.NaN else cov / den
  }
}

object CrossGram {
  def compute(df: DataFrame, colsA: Seq[String], colsB: Seq[String]): CrossGram = {
    import org.apache.spark.sql.functions.col
    val dA = colsA.size; val dB = colsB.size
    val sel = (colsA ++ colsB).map(c => col(s"`${c.replace("`", "``")}`").cast("double"))
    // InternalRow pass (toRdd, not .rdd): no per-field boxing; one
    // accumulator + one pair of scratch arrays per PARTITION, not per row
    val buffers = df.select(sel: _*).queryExecution.toRdd.mapPartitions { rows =>
      val acc = new CrossGram(dA, dB)
      val a = new Array[Double](dA); val b = new Array[Double](dB)
      rows.foreach { row =>
        var bad = false
        var i = 0
        while (i < dA && !bad) {
          if (row.isNullAt(i)) bad = true else { a(i) = row.getDouble(i); if (a(i).isNaN || a(i).isInfinite) bad = true }
          i += 1
        }
        var j = 0
        while (j < dB && !bad) {
          if (row.isNullAt(dA + j)) bad = true else { b(j) = row.getDouble(dA + j); if (b(j).isNaN || b(j).isInfinite) bad = true }
          j += 1
        }
        if (!bad) acc.add(a, b)
      }
      Iterator.single(acc)
    }
    // ordered merge (not treeReduce): deterministic double-sum order
    DetReduce.orderedReduce[CrossGram](buffers, (x, y) => x.merge(y), new CrossGram(dA, dB))
  }
}
