package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing, deterministic sampling/mixing, and contamination
  * flagging — the corpus-curation operators.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- Pack.concatChunk --------------------------------------------------

  test("concatChunk: hand-computed offsets and chunk spans (one shard)") {
    // docs in id order with token counts 4, 3, 5, 2; budget 6
    val docs = Seq((0L, 4L), (1L, 3L), (2L, 5L), (3L, 2L)).toDF("doc_id", "tok")
    val out = Pack.concatChunk(docs, "doc_id", "tok", budget = 6, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // stream: [0,4) [4,7) [7,12) [12,14) over chunks of 6 tokens
    assert(out === Seq(
      (0L, 0L, 0L, 0L),   // tokens 0..3   -> chunk 0
      (1L, 4L, 0L, 1L),   // tokens 4..6   -> spans chunks 0-1
      (2L, 7L, 1L, 1L),   // tokens 7..11  -> chunk 1
      (3L, 12L, 2L, 2L))) // tokens 12..13 -> chunk 2
  }

  test("concatChunk: shards are independent streams; zero-token docs clamp to 1") {
    val docs = Seq((0L, 5L), (1L, 0L), (2L, 5L), (3L, 7L)).toDF("doc_id", "tok")
    val out = Pack.concatChunk(docs, "doc_id", "tok", budget = 4, nShards = 2)
      .orderBy("doc_id")
      .select("doc_id", "shard", "tok_start", "chunk_first", "chunk_last")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // shard 0: ids 0,2 -> streams [0,5) [5,10); shard 1: ids 1(clamped 1),3 -> [0,1) [1,8)
    assert(out === Seq(
      (0L, 0, 0L, 0L, 1L),
      (1L, 1, 0L, 0L, 0L),
      (2L, 0, 5L, 1L, 2L),
      (3L, 1, 1L, 0L, 1L)))
  }

  test("concatChunk: duplicate ids get DISTINCT running sums (ROWS frame), never overlapping spans") {
    val docs = Seq((0L, 5L), (1L, 4L), (1L, 6L), (2L, 3L)).toDF("doc_id", "tok")
    val out = Pack.concatChunk(docs, "doc_id", "tok", budget = 8, nShards = 1)
      .select("tok_start").as[Long].collect().toSeq.sorted
    // a RANGE frame would give both id-1 rows the same tok_end (overlap);
    // ROWS yields four distinct starts tiling [0, 18)
    assert(out.distinct.size === 4)
    assert(out.head === 0L && out.contains(5L))
  }

  // ---- Pack.greedyPack ---------------------------------------------------

  /** In-memory reference greedy packer (same rule as the doc). */
  private def refGreedy(docs: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var bin = 0L; var running = 0L; var empty = true
    docs.sortBy(_._1).map { case (id, tok0) =>
      val tok = math.max(tok0, 1L)
      if (!empty && running + tok > budget) { bin += 1; running = 0L }
      running += tok; empty = false
      id -> bin
    }.toMap
  }

  test("greedyPack matches the reference recurrence on a random fixture") {
    val rng = new scala.util.Random(11)
    val docs = (0L until 200L).map(i => (i, rng.nextInt(40).toLong))
    val nShards = 4
    val out = Pack.greedyPack(docs.toDF("doc_id", "tok"), "doc_id", "tok",
        budget = 100L, nShards = nShards)
      .as[(Long, Int, Long)].collect()
    val expected = (0 until nShards).flatMap { s =>
      refGreedy(docs.filter(_._1 % nShards == s), 100L).map { case (id, b) => (id, s, b) }
    }.toSet
    assert(out.toSet === expected)
    assert(out.length === docs.length) // every doc packed exactly once
  }

  test("greedyPack invariants: bins within budget, oversized doc isolated, bins contiguous") {
    val docs = Seq((0L, 3L), (1L, 9L), (2L, 25L), (3L, 4L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "tok")
    val out = Pack.greedyPack(docs, "doc_id", "tok", budget = 10L, nShards = 1)
      .as[(Long, Int, Long)].collect().toSeq.sortBy(_._1)
    val byBin = out.groupBy(_._3).view.mapValues(_.map(_._1)).toMap
    // 3+9>10 -> bin splits; 25 oversized alone; then 4+4 fits, +4 overflows
    assert(byBin(0L) === Seq(0L))
    assert(byBin(1L) === Seq(1L))
    assert(byBin(2L) === Seq(2L))
    assert(byBin(3L) === Seq(3L, 4L))
    assert(byBin(4L) === Seq(5L))
    assert(byBin.keySet === Set(0L, 1L, 2L, 3L, 4L))
  }

  // ---- Sampling ----------------------------------------------------------

  test("hashSample: deterministic, near-expected size, and a subset of the input") {
    val df = spark.range(0, 2000).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.3, seed = 7).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df, "id", 0.3, seed = 7).select("id").as[Long].collect().toSet
    assert(a === b)                           // bit-deterministic
    assert(math.abs(a.size - 600) < 90)       // ~Binomial(2000, .3), ±4.4σ
    val superset = Sampling.hashSample(df, "id", 0.6, seed = 7)
      .select("id").as[Long].collect().toSet
    assert(a.subsetOf(superset))              // nested samples: same hash, larger cut
  }

  test("stratifiedSample: per-stratum rates; unknown strata dropped by default") {
    val df = spark.range(0, 3000)
      .select(col("id"), (col("id") % 3).cast("string").as("stratum"))
    val out = Sampling.stratifiedSample(df, "id", "stratum",
      Map("0" -> 1.0, "1" -> 0.2), seed = 3)
    val counts = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts("0") === 1000)              // fraction 1.0 keeps everything
    assert(math.abs(counts("1") - 200) < 60)
    assert(!counts.contains("2"))             // absent stratum -> default 0.0
  }

  test("tokenBudgetMix: budgets exact, kept set is a prefix of the hash-ranked stream") {
    val rng = new scala.util.Random(5)
    val df = (0L until 500L)
      .map(i => (i, 1L + rng.nextInt(50).toLong, if (i % 2 == 0) "web" else "code"))
      .toDF("doc_id", "tok", "source")
    val out = Sampling.tokenBudgetMix(df, "doc_id", "tok", "source",
        Map("web" -> 900L, "code" -> 400L), seed = 1)
      .select("doc_id", "source", "mix_rank", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSeq
    val bySource = out.groupBy(_._2)
    assert(bySource("web").map(_._4).max <= 900L)
    assert(bySource("code").map(_._4).max <= 400L)
    // prefix: ranks are exactly 1..k with cum_tokens strictly increasing in rank
    for ((_, rows) <- bySource) {
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3) === (1L to sorted.length.toLong))
      assert(sorted.map(_._4) === sorted.map(_._4).sorted)
    }
    // determinism across runs
    val again = Sampling.tokenBudgetMix(df, "doc_id", "tok", "source",
        Map("web" -> 900L, "code" -> 400L), seed = 1)
      .select("doc_id", "source", "mix_rank", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(again.toSet === out.toSet)
  }

  test("tokenBudgetMix: distributed prefix sum is bit-identical to a window and window-free") {
    val rng = new scala.util.Random(9)
    val df = (0L until 800L)
      .map(i => (i, 1L + rng.nextInt(30).toLong, s"s${i % 5}"))
      .toDF("doc_id", "tok", "source")
    val budgets = Map("s0" -> 500L, "s1" -> 700L, "s2" -> 100L, "s3" -> 10000L)
    val got = Sampling.tokenBudgetMix(df, "doc_id", "tok", "source", budgets, seed = 4)
    // reference: the straight per-source window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("__u"), col("doc_id"))
    val b = budgets.toSeq.toDF("__source", "__budget")
    val ref = df.join(broadcast(b), df("source") === col("__source"))
      .withColumn("__u", Sampling.hashU(col("doc_id"), 4))
      .withColumn("mix_rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("tok")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .where(col("cum_tokens") <= col("__budget"))
      .select("doc_id", "source", "mix_rank", "cum_tokens")
    val gotS = got.select("doc_id", "source", "mix_rank", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    val refS = ref.as[(Long, String, Long, Long)].collect().toSet
    assert(gotS === refS)
    // REGRESSION: a narrow repartitioning downstream (Verify writes with
    // coalesce(1)) must not disturb ranks — a TaskContext-keyed offset
    // lookup sees the coalesced task's id and applied partition 0's
    // offsets to every partition; pids are data now
    val coalesced = got.coalesce(1)
      .select("doc_id", "source", "mix_rank", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(coalesced === refS)
    // plan: NO per-source window sort anywhere; the result reads the
    // locally-checkpointed ranged RDD (the range exchange lives in the
    // checkpoint's build lineage, pinning partition ids for the offsets)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(plan.contains("ExistingRDD"), s"expected checkpointed-RDD scan in:\n$plan")
  }

  // ---- topFractionByScore / topKByScore ----------------------------------

  test("topFractionByScore: exact ceil(p*n) rows, window parity with score ties, nulls dropped") {
    // heavy ties: only 7 distinct scores over 200 rows, plus 10 null-score
    // rows that must not count toward n or survive
    val df = ((0L until 200L).map(i => (i, Some((i % 7) * 0.5))) ++
        (200L until 210L).map(i => (i, Option.empty[Double])))
      .toDF("doc_id", "score")
    val got = Sampling.topFractionByScore(df, "doc_id", "score", 0.3)
      .select("doc_id", "score", "score_rank")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.size === 60)                    // ceil(0.3 * 200)
    // reference: the straight global-window formulation
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("doc_id"))
    val ref = df.where(col("score").isNotNull)
      .withColumn("score_rank", row_number().over(w).cast("long"))
      .where(col("score_rank") <= 60)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.toSet === ref.toSet)
    // determinism + the coalesce regression (Verify writes coalesce(1)):
    // frozen pids must keep offsets right under a narrow repartitioning
    val coalesced = Sampling.topFractionByScore(df, "doc_id", "score", 0.3)
      .coalesce(1).select("doc_id", "score", "score_rank")
      .as[(Long, Double, Long)].collect().toSet
    assert(coalesced === ref.toSet)
    // fraction edges
    assert(Sampling.topFractionByScore(df, "doc_id", "score", 1.0).count() === 200)
    assert(Sampling.topFractionByScore(df, "doc_id", "score", 0.0).count() === 0)
  }

  test("topFractionByScorePerGroup: per-group ceil cut, window parity, null group/score dropped") {
    // three groups of very different sizes (120 / 60 / 20) + nulls
    val df = ((0L until 200L).map { i =>
        val g = if (i < 120) "web" else if (i < 180) "code" else "wiki"
        (i, Some((i * 31 % 13) * 0.25), Option(g))
      } ++ Seq((200L, Option.empty[Double], Option("web")),
               (201L, Some(9.9), Option.empty[String])))
      .toDF("doc_id", "score", "src")
    val got = Sampling.topFractionByScorePerGroup(df, "doc_id", "score", "src", 0.25)
      .select("doc_id", "src", "score_rank")
      .as[(Long, String, Long)].collect().toSeq
    // per-group keep counts: ceil(0.25 * {120, 60, 20}) = {30, 15, 5}
    val byG = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byG === Map("web" -> 30, "code" -> 15, "wiki" -> 5))
    assert(!got.exists(r => r._1 == 200L || r._1 == 201L)) // nulls dropped
    // reference: per-group window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("score").desc, col("doc_id"))
    val ref = df.where(col("score").isNotNull && col("src").isNotNull)
      .withColumn("score_rank", row_number().over(w).cast("long"))
      .withColumn("n_g", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .where(col("score_rank") <= ceil(col("n_g") * 0.25))
      .select("doc_id", "src", "score_rank")
      .as[(Long, String, Long)].collect().toSet
    assert(got.toSet === ref)
    // coalesce regression: frozen (pid, group) offsets survive a narrow
    // downstream repartitioning
    val coalesced = Sampling.topFractionByScorePerGroup(df, "doc_id", "score", "src", 0.25)
      .coalesce(1).select("doc_id", "src", "score_rank")
      .as[(Long, String, Long)].collect().toSet
    assert(coalesced === ref)
  }

  test("topFractionByScore / quantileValues: output invariant under the partition count") {
    // the range layout changes with spark.sql.shuffle.partitions but the
    // total order (score desc/asc, id) does not — ranks and thresholds
    // must be bit-identical at any parallelism
    val df = (0L until 300L).map(i => (i, ((i * 53) % 41) * 0.125)).toDF("doc_id", "score")
    val at32 = Sampling.topFractionByScore(df, "doc_id", "score", 0.1)
      .select("doc_id", "score_rank").as[(Long, Long)].collect().toSet
    val qAt32 = Sampling.quantileValues(df, "doc_id", "score", Seq(0.5, 0.9))
      .as[(Double, Double)].collect().toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val at7 = Sampling.topFractionByScore(df, "doc_id", "score", 0.1)
        .select("doc_id", "score_rank").as[(Long, Long)].collect().toSet
      val qAt7 = Sampling.quantileValues(df, "doc_id", "score", Seq(0.5, 0.9))
        .as[(Double, Double)].collect().toSet
      assert(at7 === at32)
      assert(qAt7 === qAt32)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("quantileValues: exact discrete quantiles, shared ranks, nulls excluded") {
    // scores 1.0..100.0 shuffled in id order; 5 null-score rows excluded
    val df = ((0L until 100L).map(i => (i, Some(((i * 37) % 100 + 1).toDouble))) ++
        (100L until 105L).map(i => (i, Option.empty[Double])))
      .toDF("doc_id", "score")
    val got = Sampling.quantileValues(df, "doc_id", "score", Seq(0.25, 0.5, 0.9, 1.0))
      .as[(Double, Double)].collect().toMap
    // n = 100, values are exactly 1..100 => rank k holds value k
    assert(got === Map(0.25 -> 25.0, 0.5 -> 50.0, 0.9 -> 90.0, 1.0 -> 100.0))
    // two quantiles hitting the SAME rank both get the value (n = 3)
    val tiny = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("doc_id", "score")
    val shared = Sampling.quantileValues(tiny, "doc_id", "score", Seq(0.5, 0.6, 0.34))
      .as[(Double, Double)].collect().toMap
    assert(shared === Map(0.5 -> 20.0, 0.6 -> 20.0, 0.34 -> 20.0)) // ceil(.34*3)=ceil(1.02)=2
    // empty input -> empty result; bad q -> loud failure
    assert(Sampling.quantileValues(df.limit(0), "doc_id", "score", Seq(0.5)).count() === 0)
    intercept[IllegalArgumentException] {
      Sampling.quantileValues(df, "doc_id", "score", Seq(0.0))
    }
  }

  test("topKByScore: absolute k, clamps past n; plan is window-free") {
    val df = (0L until 50L).map(i => (i, (i * 37 % 50) / 10.0)).toDF("doc_id", "score")
    val top5 = Sampling.topKByScore(df, "doc_id", "score", 5)
      .orderBy(col("score_rank")).select("doc_id").as[Long].collect().toSeq
    val expect = (0L until 50L).map(i => (i, (i * 37 % 50) / 10.0))
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(top5 === expect)
    assert(Sampling.topKByScore(df, "doc_id", "score", 1000).count() === 50)
    assert(Sampling.topKByScore(df, "doc_id", "score", 0).count() === 0)
    // NO global window sort anywhere; the ranked side reads the
    // locally-checkpointed ranged RDD
    val out = Sampling.topKByScore(df, "doc_id", "score", 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(plan.contains("ExistingRDD"), s"expected checkpointed-RDD scan in:\n$plan")
  }

  // ---- PII redaction -------------------------------------------------------

  test("redact: emails, URLs, IPv4 in fixed order; counts match; clean text untouched") {
    val docs = Seq(
      (1L, "mail a.b+c@foo-bar.org or see https://x.io/p?q=1 from 192.168.0.1 twice 10.0.0.255"),
      (2L, "no pii here at all"),
      (3L, "edge: v1.2.3.4000 is not an ip-ish word but 1.2.3.4 is")
    ).toDF("doc_id", "text")
    val out = docs.select(
        Seq(col("doc_id"), TextOps.redact(col("text")).as("r")) ++
          TextOps.piiCounts(col("text")): _*)
      .orderBy("doc_id").as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out(0) === ((1L, "mail <EMAIL> or see <URL> from <IP> twice <IP>", 1L, 1L, 2L)))
    assert(out(1) === ((2L, "no pii here at all", 0L, 0L, 0L)))
    // the {1,3} quantifier matches the leading 3 digits of 4000: redaction
    // is deliberately recall-biased (scrubbing too much beats leaking)
    assert(out(2)._3 === 0L && out(2)._5 === 2L)
    assert(out(2)._2.contains("<IP> is"))
  }

  // ---- composed curation flagship ----------------------------------------

  test("q_curate: the composed chain keeps a nonempty, strictly-curated subset") {
    val out = graft.SparkEntry.queries("q_curate")(spark, "/root/testdata/sf0.001")
    val n = out.count()
    val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(n > 0 && n < total)          // every gate engaged, none annihilated
    // packing invariants on the surviving set: per shard the stream is
    // contiguous from 0 (tok_start of the first doc is 0)
    import org.apache.spark.sql.functions._
    val firsts = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("tok_start") =!= 0L).count() === 0)
    assert(out.filter(col("chunk_last") < col("chunk_first")).count() === 0)
  }

  // ---- Contamination -----------------------------------------------------

  test("contamination: exact overlap counts and threshold verdicts") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "the quick brown fox jumps high"),   // shares 3 trigrams
      (1L, "completely unrelated text here ok"), // shares 0
      (2L, "the quick brown fox jumps over the lazy dog indeed") // shares all 7
    ).toDF("doc_id", "text")
    val out = Contamination.flagContaminated(corpus, bench, "doc_id", "text",
        n = 3, minOverlap = 4)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    // bench trigrams: {the quick brown, quick brown fox, brown fox jumps,
    //                  fox jumps over, jumps over the, over the lazy, the lazy dog}
    assert(out === Seq((0L, 3L, false), (1L, 0L, false), (2L, 7L, true)))
  }

  test("contamination: benchmark side plans as a broadcast join") {
    val bench = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c x")).toDF("doc_id", "text")
    val plan = Contamination.overlapCounts(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
