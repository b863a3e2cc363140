package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Materialized sequence packing: stream-vs-arithmetic equivalence, token
  * conservation, shard isolation, boundary-spanning docs, n_docs
  * accounting, and the BPE front door end-to-end.
  */
class PackSequencesSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16

  /** Plain-Scala mirror: concat ids in (shard, id) order, cut every L. */
  private def mirror(docs: Seq[(Long, Seq[Int])], nShards: Int)
      : Map[(Int, Long), Seq[Int]] = {
    docs.groupBy(d => (d._1 % nShards).toInt).flatMap { case (shard, ds) =>
      val stream = ds.sortBy(_._1).flatMap(_._2)
      stream.grouped(L).zipWithIndex.map { case (chunk, i) =>
        (shard, i.toLong) -> chunk
      }
    }
  }

  private def collectPacked(df: org.apache.spark.sql.DataFrame)
      : Map[(Int, Long), (Seq[Int], Int, Int)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) ->
      ((r.getSeq[Int](2), r.getInt(3), r.getInt(4)))).toMap

  private def collectStarts(df: org.apache.spark.sql.DataFrame)
      : Map[(Int, Long), Seq[Int]] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Int](5)).toMap

  test("stream packing equals the arithmetic mirror on random-ish docs") {
    val docs = (0L until 60L).map(i =>
      (i, (0 until ((i * 7 + 3) % 23).toInt).map(j => (i * 100 + j).toInt)))
    val df = docs.toDF("doc_id", "ids")
    val got = collectPacked(Pack.packSequences(df, "doc_id", "ids", L, nShards = 4))
    val exp = mirror(docs, 4)
    assert(got.keySet === exp.keySet)
    for ((k, ids) <- exp) {
      assert(got(k)._1 === ids, s"chunk $k")
      assert(got(k)._2 === ids.length)
    }
    // every sequence but the shard-last is exactly L long
    val lastSeq = got.keys.groupBy(_._1).map { case (s, ks) => s -> ks.map(_._2).max }
    for (((shard, seq), (ids, n, _)) <- got if seq != lastSeq(shard))
      assert(n === L, s"non-final chunk ($shard,$seq) has $n tokens")
  }

  test("a document spanning sequences is split, order preserved") {
    val big: Seq[Int] = (0 until 40).toVector // 2.5 sequences worth
    val df = Seq((0L, big)).toDF("doc_id", "ids")
    val got = collectPacked(Pack.packSequences(df, "doc_id", "ids", L, nShards = 1))
    assert(got.keySet === Set((0, 0L), (0, 1L), (0, 2L)))
    assert(got((0, 0L))._1 === big.slice(0, 16))
    assert(got((0, 1L))._1 === big.slice(16, 32))
    assert(got((0, 2L))._1 === big.slice(32, 40))
    assert(got((0, 2L))._2 === 8) // partial tail emitted
    assert(got.values.forall(_._3 === 1)) // the one doc touches each chunk
    // carried doc resumes at offset 0 in every later sequence
    val starts = collectStarts(Pack.packSequences(df, "doc_id", "ids", L, nShards = 1))
    assert(starts.values.toSeq.forall(_ === Seq(0)))
  }

  test("n_docs counts documents contributing tokens; empty docs don't") {
    val df = Seq(
      (0L, Seq(1, 2, 3, 4, 5, 6, 7, 8)), // 8 tokens
      (1L, Seq.empty[Int]), // no slot
      (2L, Seq(9, 10, 11, 12, 13, 14, 15, 16)), // fills chunk 0 exactly
      (3L, Seq(17, 18))).toDF("doc_id", "ids")
    val packed = Pack.packSequences(df, "doc_id", "ids", L, nShards = 1)
    val got = collectPacked(packed)
    assert(got((0, 0L)) === ((1 to 16).toSeq, 16, 2)) // docs 0 and 2
    assert(got((0, 1L)) === (Seq(17, 18), 2, 1)) // doc 3 only
    // doc boundaries: doc 0 starts at 0, doc 2 at 8; doc 3 at 0 of seq 1
    val starts = collectStarts(packed)
    assert(starts((0, 0L)) === Seq(0, 8))
    assert(starts((0, 1L)) === Seq(0))
    // n_docs always equals the boundary count
    assert(got.forall { case (k, (_, _, nd)) => nd === starts(k).length })
  }

  test("shards are independent streams; empty input -> no sequences") {
    val docs = (0L until 20L).map(i => (i, Seq.fill(5)(i.toInt)))
    val df = docs.toDF("doc_id", "ids")
    val got = collectPacked(Pack.packSequences(df, "doc_id", "ids", L, nShards = 5))
    // shard s holds docs s, s+5, s+10, s+15 -> 20 tokens -> chunks of 16+4
    for (s <- 0 until 5) {
      assert(got((s, 0L))._2 === 16)
      assert(got((s, 1L))._2 === 4)
      val toks = got((s, 0L))._1 ++ got((s, 1L))._1
      assert(toks === Seq(s, s + 5, s + 10, s + 15).flatMap(i => Seq.fill(5)(i)))
    }
    assert(Pack.packSequences(df.limit(0), "doc_id", "ids", L, 5).count() === 0)
  }

  test("plan shape: one range shuffle on shard, no window, no per-token explode") {
    val df = Seq((0L, Seq(1, 2, 3))).toDF("doc_id", "ids")
    val plan = Pack.packSequences(df, "doc_id", "ids", L, nShards = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range shuffle in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(!plan.toLowerCase.contains("generate"), // Explode plans as Generate
      s"unexpected per-token explode in:\n$plan")
  }

  test("BPE front door: encode + pack conserves the token stream") {
    val res = getClass.getResource("/fixtures/bpe_merges.txt").getPath
    val vocab = getClass.getResource("/fixtures/bpe_vocab.txt").getPath
    val enc = new BpeEncoder(BpeModel.loadFile(res), BpeModel.loadVocabFile(vocab))
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") < 50)
      .withColumn("ids", BpeModel.encodeCol(col("text"), enc))
    val packed = Pack.packSequences(docs, "doc_id", "ids", seqLen = 64, nShards = 4)
    val packedTokens = packed.agg(sum("n_tokens")).collect()(0).getLong(0)
    val directTokens = docs.select(sum(size(col("ids")))).collect()(0).getLong(0)
    assert(packedTokens === directTokens)
    // concatenated chunk streams equal the concatenated doc streams per shard
    val fromChunks = packed.orderBy("shard", "seq")
      .collect().groupBy(_.getInt(0))
      .map { case (s, rows) => s -> rows.sortBy(_.getLong(1)).flatMap(_.getSeq[Int](2)).toSeq }
    val fromDocs = docs.select(pmod(col("doc_id"), lit(4)).cast("int").as("s"),
        col("doc_id"), col("ids")).collect()
      .groupBy(_.getInt(0))
      .map { case (s, rows) => s -> rows.sortBy(_.getLong(1)).flatMap(_.getSeq[Int](2)).toSeq }
    assert(fromChunks === fromDocs)
  }
}
