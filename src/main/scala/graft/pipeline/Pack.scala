package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents out into fixed token-budget training
  * chunks. Two industry-standard layouts:
  *
  *   - [[concatChunk]] — "concat-and-split" (GPT-style pretraining): the
  *     shard's documents are concatenated in deterministic order and the
  *     token stream is cut every `budget` tokens; a document may span
  *     chunks. Pure window arithmetic — fully SQL-expressible.
  *   - [[greedyPack]] — no-split greedy binning (SFT-style packing): a doc
  *     never crosses a chunk boundary; a new bin opens when the doc would
  *     not fit. Sequential recurrence per shard — a linear `mapPartitions`
  *     streaming pass over shard-sorted partitions.
  *
  * Scale shape (both): ONE hash shuffle on the shard id + ONE sort within
  * each shard, then embarrassingly parallel per-shard streams — at 10¹²
  * docs each shard is an independent packing stream, so throughput scales
  * with executor count and no state ever exceeds one running counter.
  * Sharding is `pmod(id, nShards)` (value-deterministic, engine-portable)
  * rather than a hash so results are reproducible across engines and runs.
  */
object Pack {

  private def shardCol(idCol: String, nShards: Int): Column =
    pmod(col(idCol), lit(nShards)).cast("int")

  /** Concat-and-split layout. Output: one row per doc —
    * (id, shard, tok_start, chunk_first, chunk_last) where `tok_start` is
    * the doc's offset in its shard's concatenated token stream and
    * chunk_first..chunk_last the `budget`-token chunks it touches.
    * Token counts are clamped to ≥ 1 (an empty doc still occupies a slot,
    * keeping chunk_last ≥ chunk_first invariant).
    */
  def concatChunk(docs: DataFrame, idCol: String, tokensCol: String,
                  budget: Int, nShards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val toks = greatest(col(tokensCol).cast("long"), lit(1L))
    // explicit ROWS frame: the orderBy default is RANGE, which would hand
    // duplicate ids one shared tok_end (overlapping token spans) instead of
    // distinct running sums
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", shardCol(idCol, nShards))
      .withColumn("tok_end", sum(toks).over(w))
      .select(
        col(idCol), col("shard"),
        (col("tok_end") - toks).as("tok_start"),
        floor((col("tok_end") - toks) / budget).cast("long").as("chunk_first"),
        floor((col("tok_end") - 1) / budget).cast("long").as("chunk_last"))
  }

  /** Greedy no-split packing. Docs are visited in ascending id order within
    * their shard; the current bin admits a doc unless the bin is non-empty
    * and adding it would exceed `budget` (so an oversized doc gets a bin of
    * its own). Output: (id, shard, bin) with bins numbered 0.. per shard.
    *
    * The shard partitioning is pinned to an explicit partition count
    * (AQE-coalesce-proof — see the repartition determinism note in
    * FeatSel.withShuffledCopy) and each shard lives wholly inside one
    * partition, so the per-shard recurrence is a deterministic single pass.
    */
  def greedyPack(docs: DataFrame, idCol: String, tokensCol: String,
                 budget: Long, nShards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    // range partition (not hash): hashing nShards distinct shard values into
    // nShards partitions collides ~1/e of them, stacking several shards'
    // serial recurrences into one straggler task while other tasks idle;
    // range boundaries give ~one shard per partition and equal shard values
    // can never split across partitions
    val prepared = docs
      .select(col(idCol).cast("long").as("id"),
        shardCol(idCol, nShards).as("shard"),
        greatest(col(tokensCol).cast("long"), lit(1L)).as("tok"))
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Int, Long)]
    prepared.mapPartitions { it =>
      var curShard = Int.MinValue
      var bin = 0L
      var running = 0L
      var empty = true
      it.map { case (id, shard, tok) =>
        if (shard != curShard) { curShard = shard; bin = 0L; running = 0L; empty = true }
        if (!empty && running + tok > budget) { bin += 1; running = 0L }
        running += tok
        empty = false
        (id, shard, bin)
      }
    }.toDF(idCol, "shard", "bin")
  }

  /** Materialized concat-and-split packing: emits the actual fixed-length
    * training sequences, not just chunk assignments. Documents' token-id
    * arrays (e.g. from [[BpeModel.encodeCol]]) are concatenated in
    * ascending id order within each shard and cut every `seqLen` tokens; a
    * document may span sequences; the final partial sequence of each shard
    * is emitted with n_tokens < seqLen. Output: (shard, seq, input_ids,
    * n_tokens, n_docs, doc_starts) where n_docs counts documents
    * contributing >= 1 token to the sequence and doc_starts holds the
    * offset of each such document's first token in THIS sequence (a doc
    * carried over from the previous sequence starts at 0) — the boundary
    * list a trainer needs to reset position ids / mask cross-document
    * attention inside packed sequences. Token-less documents occupy no
    * slot.
    *
    * Scale shape: [[greedyPack]]'s — one range shuffle on the shard id +
    * one sort, then a linear per-shard stream; per-task state is ONE
    * seqLen-sized buffer, so sequence length never inflates memory and
    * throughput scales with shards. Equivalent by construction to the SQL
    * formulation "global position within shard divided by seqLen" (the
    * driver oracle recomputes it that way).
    */
  def packSequences(docs: DataFrame, idCol: String, idsCol: String,
                    seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(col(idCol).cast("long").as("id"),
        shardCol(idCol, nShards).as("shard"),
        coalesce(col(idsCol), array()).cast("array<int>").as("ids"))
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Int, Array[Int])]
    prepared.mapPartitions { it =>
      new Iterator[(Int, Long, Array[Int], Int, Int, Array[Int])] {
        private val pending =
          scala.collection.mutable.Queue.empty[(Int, Long, Array[Int], Int, Int, Array[Int])]
        private var curShard = Int.MinValue
        private var seqNo = 0L
        private var buf = new Array[Int](seqLen)
        private var n = 0
        private var starts = scala.collection.mutable.ArrayBuffer.empty[Int]
        private var exhausted = false

        private def emit(): Unit = {
          pending += ((curShard, seqNo, java.util.Arrays.copyOf(buf, n), n,
            starts.length, starts.toArray))
          seqNo += 1; n = 0; starts.clear()
        }

        private def advance(): Unit = {
          while (pending.isEmpty && it.hasNext) {
            val (_, shard, ids) = it.next()
            if (shard != curShard) {
              if (n > 0) emit()
              curShard = shard; seqNo = 0L; n = 0; starts.clear()
            }
            if (ids.nonEmpty) {
              starts += n
              var off = 0
              while (off < ids.length) {
                val take = math.min(seqLen - n, ids.length - off)
                System.arraycopy(ids, off, buf, n, take)
                n += take; off += take
                if (n == seqLen) {
                  emit()
                  if (off < ids.length) starts += 0 // carried doc resumes at 0
                }
              }
            }
          }
          if (pending.isEmpty && !it.hasNext && !exhausted) {
            exhausted = true
            if (n > 0) emit()
          }
        }

        override def hasNext: Boolean = { advance(); pending.nonEmpty }
        override def next(): (Int, Long, Array[Int], Int, Int, Array[Int]) = {
          advance(); pending.dequeue()
        }
      }
    }.toDF("shard", "seq", "input_ids", "n_tokens", "n_docs", "doc_starts")
  }
}
