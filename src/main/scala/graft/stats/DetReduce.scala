package graft.stats

import scala.reflect.ClassTag

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD

/** Deterministic replacement for `treeReduce` over per-partition
  * accumulator buffers.
  *
  * `treeReduce`/`treeAggregate` combine partition results in TASK-COMPLETION
  * order, so double summation order — and with it every
  * epsilon-at-the-threshold decision downstream (selection vote cutoffs,
  * correlation filters) — varies run-to-run and with concurrent load. This
  * helper tags each buffer with its partition id, shuffles all buffers into
  * one task (`repartitionAndSortWithinPartitions` — shuffle-sorted by pid,
  * NO sampling pass, so the expensive buffer RDD is computed exactly once),
  * and folds them left-to-right in ascending pid order: bit-identical
  * results for identical inputs, regardless of scheduling.
  *
  * Cost vs treeReduce: the combine runs sequentially in one task instead of
  * a tree — fine for O(partitions) buffers of sufficient statistics (the
  * per-partition SCAN work, which dominates, stays fully parallel).
  */
object DetReduce {

  /** Fold one-buffer-per-partition `buffers` in ascending partition order.
    * `merge` may mutate and return its left argument. `empty` is returned
    * for a zero-partition/zero-buffer RDD.
    */
  def orderedReduce[T: ClassTag](buffers: RDD[T], merge: (T, T) => T, empty: => T): T = {
    val tagged = buffers.mapPartitionsWithIndex((pid, it) => it.map(b => (pid, b)))
    tagged.repartitionAndSortWithinPartitions(new HashPartitioner(1))
      .mapPartitions { it =>
        var acc: Option[T] = None
        it.foreach { case (_, b) => acc = Some(acc.fold(b)(a => merge(a, b))) }
        Iterator.single(acc)
      }
      .collect() match {
        case Array(Some(a)) => a
        case _ => empty
      }
  }
}
