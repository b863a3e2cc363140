package graft.stats

import scala.reflect.ClassTag

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD

/** Deterministic replacement for `treeReduce` over per-partition
  * accumulator buffers.
  *
  * `treeReduce`/`treeAggregate` combine partition results in TASK-COMPLETION
  * order, so double summation order — and with it every
  * epsilon-at-the-threshold decision downstream (selection vote cutoffs,
  * correlation filters) — varies run-to-run and with concurrent load. This
  * helper folds buffers in ASCENDING PARTITION-ID order through a
  * deterministic reduction tree: each level groups `fanIn` consecutive pids
  * into one bucket (`repartitionAndSortWithinPartitions` — shuffle-sorted
  * by (bucket, pid), NO sampling pass, so the expensive buffer RDD is
  * computed exactly once) and folds the bucket left-to-right in one task.
  * Levels repeat until one bucket remains: bit-identical results for
  * identical inputs, regardless of scheduling.
  *
  * Scale shape: no task ever receives more than `fanIn` buffers — at 10^4
  * input partitions with O(folds·d²) Gram buffers the flat single-task fold
  * would ingest hundreds of GB, where the tree does log_fanIn(P) levels of
  * bounded merges (the per-partition SCAN work, which dominates, stays
  * fully parallel either way; 32-partition local runs collapse to a single
  * level, identical to a flat ordered fold).
  */
object DetReduce {

  /** bucket-id → partition bijection for ((bucket, pid), buffer) keys. */
  private final class BucketPartitioner(buckets: Int) extends Partitioner {
    override def numPartitions: Int = buckets
    override def getPartition(key: Any): Int = key.asInstanceOf[(Int, Int)]._1
  }

  /** Fold one-buffer-per-partition `buffers` in ascending partition order.
    * `merge` may mutate and return its left argument. `empty` is returned
    * for a zero-partition/zero-buffer RDD.
    */
  def orderedReduce[T: ClassTag](buffers: RDD[T], merge: (T, T) => T, empty: => T,
                                 fanIn: Int = 64): T = {
    require(fanIn >= 2, "fanIn must be >= 2")
    var cur: RDD[(Int, T)] =
      buffers.mapPartitionsWithIndex((pid, it) => it.map(b => (pid, b)))
    var width = math.max(1, buffers.getNumPartitions)
    while (true) {
      val buckets = math.max(1, (width + fanIn - 1) / fanIn)
      val level = cur.map { case (pid, b) => ((pid / fanIn, pid), b) }
        .repartitionAndSortWithinPartitions(new BucketPartitioner(buckets))
        .mapPartitions { it =>
          var acc: Option[(Int, T)] = None
          it.foreach { case ((bucket, _), b) =>
            acc = Some(acc match {
              case None => (bucket, b)
              case Some((_, a)) => (bucket, merge(a, b))
            })
          }
          acc.iterator
        }
      if (buckets == 1) {
        val out = level.map(_._2).collect()
        return if (out.isEmpty) empty else out(0)
      }
      cur = level
      width = buckets
    }
    empty // unreachable
  }
}
