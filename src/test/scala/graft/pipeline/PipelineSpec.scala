package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "THE  quick brown    fox jumps over the lazy dog"), // normalized dup
    (3L, "the quick brown fox jumps over the sleepy dog"),   // near dup
    (4L, "completely different content about spark engines and parquet files"),
    (5L, "spark engines and parquet files about completely different content")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps smallest id") {
    val d = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3))).sortBy(_._1)
    assert(d(0) == ((0L, true, 3L)))  // 0,1,2 share a fingerprint
    assert(d(1) == ((1L, false, 3L)))
    assert(d(2) == ((2L, false, 3L)))
    assert(d(3)._2 && d(4)._2 && d(5)._2)
    // hot-fingerprint immunity: verdicts come from an AQE-skew-splittable
    // aggregate + join, never a per-fingerprint window sort
    val plan = Dedup.exact(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }

  test("exact dedup keeps null-text rows (null-safe verdict join)") {
    import spark.implicits._
    val withNulls = Seq((0L, Some("same")), (1L, None), (2L, None), (3L, Some("same")))
      .toDF("doc_id", "text")
    val d = Dedup.exact(withNulls, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3))).sortBy(_._1)
    assert(d.length === 4)                      // no row silently dropped
    assert(d(1) == ((1L, true, 2L)))            // null group: min id canonical
    assert(d(2) == ((2L, false, 2L)))
    assert(d(0)._2 && !d(3)._2)
  }

  test("minhash LSH pairs catch near-duplicates, jaccard is sane") {
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 16, bands = 8)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)) && got.contains((0L, 2L)))
    assert(got.contains((0L, 3L)) || got.contains((1L, 3L)) || got.contains((2L, 3L)))
    val j = Dedup.ngramJaccard(pairs, docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) == 1.0)
    j.get((0L, 3L)).foreach(v => assert(v > 0.3 && v < 1.0))
  }

  test("connected components: min-label propagation over chains, isolated pairs, empty input") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L), comp.toString)
    assert(Dedup.connectedComponents(pairs.limit(0)).count() == 0)
  }

  test("frontier components: parity on chain/star/clique + round count + convergence info") {
    // mixed graph: a chain, a star, a clique — the frontier formulation must
    // match full propagation exactly
    val chain = (1L until 6L).map(i => (i, i + 1))
    val star = (21L to 25L).map(i => (20L, i))
    val clique = (for (a <- 30L to 33L; b <- (a + 1) to 33L) yield (a, b))
    val pairs = (chain ++ star ++ clique).toDF("id1", "id2")
    val r = Dedup.connectedComponentsWithInfo(pairs)
    assert(r.converged)
    val comp = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    (1L to 6L).foreach(i => assert(comp(i) == 1L, s"$i -> ${comp(i)}"))
    (20L to 25L).foreach(i => assert(comp(i) == 20L))
    (30L to 33L).foreach(i => assert(comp(i) == 30L))
    // a 99%-converged-in-round-1 graph (many 2-cliques) finishes in 2
    // rounds: one round of changes, one empty-frontier confirmation
    val flat = (0L until 100L).map(i => (2 * i, 2 * i + 1)).toDF("id1", "id2")
    val rf = Dedup.connectedComponentsWithInfo(flat)
    assert(rf.converged && rf.rounds == 2, s"rounds=${rf.rounds}")
    assert(rf.labels.where(col("component") =!= col("id") - 1 && col("component") =!= col("id"))
      .count() == 0)
    // unconverged truncation is reported, not silent
    val deep = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    val rt = Dedup.connectedComponentsWithInfo(deep, maxIter = 2)
    assert(!rt.converged && rt.rounds == 2)
    val rOk = Dedup.connectedComponentsWithInfo(deep)
    assert(rOk.converged)
    assert(rOk.labels.where(col("component") =!= 1L).count() == 0)
  }

  test("driver union-find ≡ distributed frontier propagation (label-for-label)") {
    // pseudo-random multigraph (chains, cross edges, duplicates, self-ish
    // shapes): the admission-bounded local regime and the forced
    // distributed regime must emit the IDENTICAL (id, component) labeling
    val rnd = new scala.util.Random(7)
    val edges = (Seq.tabulate(400)(i => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      ++ (1L to 50L).map(i => (i, i + 1))).filter { case (a, b) => a != b }
    val pairs = edges.toDF("id1", "id2").repartition(5)
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, s"local=${local.size} dist=${dist.size}")
    // an over-bound graph falls through to the distributed regime
    val forced = Dedup.connectedComponents(pairs, maxLocalEdges = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(forced == dist)
  }

  test("hub-star capped LSH pairs still resolve to one component") {
    // 6 identical docs, cap 3: every bucket overflows into a hub star —
    // connectivity must survive for the canonical-id resolution
    val dup6 = (1L to 6L).map(i => (i, "identical words repeated here ok")).toDF("doc_id", "text")
    val star = Dedup.lshCandidatePairs(dup6, "doc_id", "text", numHashes = 8, bands = 4, maxBucketSize = 3)
    val comp = Dedup.connectedComponents(star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.keySet == (1L to 6L).toSet && comp.values.toSet == Set(1L), comp.toString)
  }

  test("simhash: identical 0 distance, near small, different large") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(0, 1) == 0)
    assert(ham(0, 3) < ham(0, 4))
    assert(sh(4) == sh(5)) // simhash is order-insensitive over tokens
  }

  test("simhash band pairs: hamming <= bands-1 pairs guaranteed; cap gives hub star") {
    val pairs = Dedup.simhashCandidatePairs(docs, "doc_id", "text", bits = 32, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups share every band
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    // pigeonhole guarantee: verify every hamming<=3 pair was found
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- sh.keys; b <- sh.keys if a < b
         if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3)
      assert(pairs.contains((a, b)), s"missed hamming<=3 pair ($a,$b)")
    // cap: 6 identical docs at cap 3 emit the 5-pair hub star per band
    val dup6 = (1L to 6L).map(i => (i, "identical words repeated here ok")).toDF("doc_id", "text")
    val star = Dedup.simhashCandidatePairs(dup6, "doc_id", "text", maxBucketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == (2L to 6L).map(i => (1L, i)).toSet, star.toString)
  }

  test("bucketedPairs: cap-free windowless path == capped path; IdPairs == declarative expansion") {
    // r6: maxBucketSize = Int.MaxValue (the oracle-exact configs) skips the
    // sizing window and the mega branch; with a finite cap no bucket
    // reaches, the two plans must emit identical pair sets
    val many = (0L until 40L).map(i =>
      (i, if (i % 4 == 0) "shared boilerplate line here ok"
          else s"unique document number $i with words w$i x$i y$i")).toDF("doc_id", "text")
    def lsh(cap: Int) = Dedup.lshCandidatePairs(many, "doc_id", "text",
      numHashes = 8, bands = 4, maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh(Int.MaxValue) == lsh(1 << 30), "cap-free LSH pairs diverged from finite-cap")
    def sim(cap: Int) = Dedup.simhashCandidatePairs(docs, "doc_id", "text",
      bits = 32, bands = 4, maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim(Int.MaxValue) == sim(1 << 30), "cap-free simhash pairs diverged from finite-cap")
    val plan = Dedup.lshCandidatePairs(many, "doc_id", "text", 8, 4,
      maxBucketSize = Int.MaxValue).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"cap-free path still plans a Window:\n$plan")
    // IdPairs == the declarative flatten(transform(..slice..)) expansion it
    // replaced — element-for-element, ORDER included (posexplode pins it)
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    val idsDf = Seq(Seq(3L, 5L, 9L, 12L), Seq(1L), Seq.empty[Long], Seq(7L, 8L)).toDF("ids")
    def rows(c: org.apache.spark.sql.Column) = idsDf
      .select(posexplode(c).as(Seq("i", "p")))
      .select(col("i"), col("p.id1"), col("p.id2"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val nat = rows(bridge.column(graft.functions.IdPairs(bridge.expression(col("ids")))))
    val decl = rows(flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("id1"), y.as("id2"))))))
    assert(nat == decl && nat.nonEmpty, s"IdPairs diverged: nat=$nat decl=$decl")
  }

  test("text stats behave") {
    val r = docs.select(
      TextOps.tokenCount(col("text")).as("tc"),
      TextOps.stopwordRatio(col("text")).as("sr"),
      TextOps.langIdHeuristic(col("text")).as("lang"),
      TextOps.qualityScore(col("text")).as("q")
    ).collect()
    assert(r(0).getInt(0) == 9)
    assert(r(0).getDouble(1) > 0.2)
    assert(r(0).getString(2) == "en")
    assert(r(0).getDouble(3) > 0 && r(0).getDouble(3) <= 1.0)
  }

  test("repetition signals: duplicate-line and top-word fractions") {
    val df = Seq(
      (1L, "nav menu\nnav menu\ncontent here"),
      (2L, "spam spam spam ham"),
      (3L, ""),
      (4L, "all lines unique\nsecond line\nthird line")
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), TextOps.dupLineRatio(col("text")).as("d"),
        TextOps.topWordRatio(col("text")).as("w")).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(math.abs(r(1L)._1 - 1.0 / 3) < 1e-9, r(1L).toString)
    assert(math.abs(r(2L)._2 - 0.75) < 1e-9, r(2L).toString)
    assert(r(3L) == ((0.0, 0.0)), r(3L).toString)
    assert(r(4L)._1 == 0.0)
  }

  lazy val embeddings = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("brute-force knn matches a driver-side computation") {
    val all = embeddings.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val queries = embeddings.filter(col("vec_id") < 3)
    val got = Similarity.bruteForceKnn(embeddings, queries, "vec_id", "embedding", 5)
      .collect().map(r => ((r.getLong(0), r.getInt(3)), r.getLong(1))).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.max(math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum), 1e-12)
    }
    for (q <- 0L to 2L) {
      val qv = all.find(_._1 == q).get._2
      val expTop = all.filter(_._1 != q).map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      val gotTop = (1 to 5).map(r => got((q, r)))
      assert(gotTop == expTop.toSeq, s"query $q: $gotTop vs ${expTop.toSeq}")
    }
  }

  test("ivf near-dup pairs: mega cluster emits a linear hub-star, small clusters full pairs") {
    // cluster A: 40 near-identical vectors (ids 0..39) — degenerate
    // boilerplate cluster, far over the cap; cluster B: 5 members (100..104)
    val rng = new scala.util.Random(7)
    val cA = Array.fill(8)(rng.nextGaussian())
    val cB = Array.fill(8)(rng.nextGaussian())
    val mk = (c: Array[Double], eps: Double) => c.map(x => (x + rng.nextGaussian() * eps).toFloat).toSeq
    val data = (0 until 40).map(i => (i.toLong, mk(cA, 0.001))) ++
      (100 until 105).map(i => (i.toLong, mk(cB, 0.001)))
    val df = data.toDF("vec_id", "embedding").repartition(4)
    val cents = Similarity.trainCentroidsFromSample(
      Array(cA, cB).map(v => { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }), 2, iters = 1)
    val pairs = Similarity.ivfNearDupPairs(df, "vec_id", "embedding", cents,
      threshold = 0.99, nProbe = 1, maxClusterSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // mega cluster: exactly the 39 hub pairs (0,i); NO non-hub pair
    assert(pairs.count(_._1 == 0L) == 39, s"hub pairs: ${pairs.count(_._1 == 0L)}")
    assert(!pairs.exists(p => p._1 > 0L && p._2 < 100L), "non-hub pair leaked from a capped cluster")
    // small cluster under the cap keeps full pairwise coverage: C(5,2)
    assert(pairs.count(_._1 >= 100L) == 10, s"small-cluster pairs: ${pairs.count(_._1 >= 100L)}")
  }

  test("fuzzyDedup resolves known near-dup groups to canonical components") {
    // two near-dup families (word-level edits of a shared base), one exact
    // triplet, and isolated documents
    val baseA = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town " +
      "square and the evening market slowly closes its wooden stalls under fading amber light"
    val baseB = "distributed query engines optimize logical plans into efficient physical operators " +
      "by pruning columns pushing filters and choosing join strategies from table statistics"
    val docs = Seq(
      1L -> baseA,
      2L -> (baseA + " tonight"),
      3L -> (baseA + " again tomorrow"),
      10L -> baseB,
      11L -> (baseB + " reliably"),
      20L -> "an entirely unrelated document about gardening and soil quality in spring",
      21L -> "another isolated text concerning medieval history and castle construction",
      30L -> "same exact words here", 31L -> "same exact words here", 32L -> "same exact words here"
    ).toDF("doc_id", "text")
    val out = Dedup.fuzzyDedup(docs, "doc_id", "text", numHashes = 8, bands = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out.size == 10) // every input row present
    // family A: component = min id 1, only 1 canonical
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(out(1L)._2 && !out(2L)._2 && !out(3L)._2)
    assert(Seq(1L, 2L, 3L).forall(out(_)._3 == 3L))
    // family B
    assert(Seq(10L, 11L).map(out(_)._1).distinct == Seq(10L) && out(10L)._2 && !out(11L)._2)
    // exact triplet collapses too (exact dup is the trivial near-dup)
    assert(Seq(30L, 31L, 32L).map(out(_)._1).distinct == Seq(30L))
    // isolated docs are their own singleton canonical components
    assert(out(20L) == ((20L, true, 1L)) && out(21L) == ((21L, true, 1L)))
    // families never merge with each other
    assert(out(1L)._1 != out(10L)._1 && out(1L)._1 != out(30L)._1)
    // capped pair stage yields the SAME component output (hub-star keeps
    // transitive connectivity — the q_fuzzy_dedup oracle contract)
    val capped = Dedup.fuzzyDedup(docs, "doc_id", "text", numHashes = 8, bands = 4,
      maxBucketSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(capped == out, "capped fuzzyDedup diverged at the component level")
    // hostile: empty corpus
    assert(Dedup.fuzzyDedup(docs.limit(0), "doc_id", "text").count() == 0)
  }

  test("cap-free ivf near-dup == brute force past 4096 vectors (recall-1 oracle contract)") {
    // The driver-gate contract (q_rp_ivf_neardup / q_ivf_neardup): when a
    // full-enumeration oracle gates the query, the hub-star cap must be
    // DISABLED — with nProbe = nCentroids every vector lands in every
    // cluster, so any corpus past maxClusterSize would otherwise silently
    // truncate to hub pairs. Proven here at > 4096 vectors: cap-free equals
    // driver-side brute force, and the DEFAULT cap demonstrably diverges.
    val rng = new scala.util.Random(21)
    val centers = Array.fill(6)(Array.fill(4)(rng.nextGaussian()))
    val n = 4200
    val data = (0 until n).map { i =>
      (i.toLong, centers(i % 6).map(x => (x + rng.nextGaussian() * 0.02).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding").repartition(4).cache()
    val cents = Similarity.trainCentroidsFromSample(
      Similarity.sampleByKey(df, "vec_id", "embedding", 64), 2)
    val capFree = Similarity.ivfNearDupPairs(df, "vec_id", "embedding", cents,
      threshold = 0.999, nProbe = 2, maxClusterSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = data.map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
    }
    val brute = (for {
      (i, vi) <- all; (j, vj) <- all if i < j
      if BigDecimal(cos(vi, vj)).setScale(5, BigDecimal.RoundingMode.HALF_UP) >= 0.999
    } yield (i, j)).toSet
    assert(capFree == brute,
      s"capFree=${capFree.size} brute=${brute.size} missing=${(brute -- capFree).take(3)}")
    val defaultCap = Similarity.ivfNearDupPairs(df, "vec_id", "embedding", cents,
      threshold = 0.999, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaultCap.size < brute.size,
      "default cap did not truncate a > 4096-member cluster — hazard test is vacuous")
    df.unpersist()
  }

  test("ivf near-dup pairs unchanged when no cluster exceeds the cap") {
    val rng = new scala.util.Random(9)
    val centers = Array.fill(4)(Array.fill(8)(rng.nextGaussian()))
    val data = (0 until 80).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding").repartition(4).cache()
    val cents = Similarity.trainCentroids(df, "embedding", nCentroids = 4, sampleSize = 80)
    def run(cap: Int, nProbe: Int = 1) = Similarity.ivfNearDupPairs(df, "vec_id", "embedding",
      cents, threshold = 0.9, nProbe = nProbe, maxClusterSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(4096) == run(1000000), "capped path changed results below the cap")
    // r6 cap-free regime: score-once (ProbeOwner) + windowless must emit the
    // same set as the windowed score-everywhere + distinct path, at nProbe=1
    // (no shared clusters beyond the own one) AND nProbe>1 (multi-cluster
    // pair dedup exercised)
    assert(run(Int.MaxValue) == run(1000000), "cap-free path diverged at nProbe=1")
    assert(run(Int.MaxValue, nProbe = 3) == run(1000000, nProbe = 3),
      "cap-free score-once path diverged at nProbe=3")
    val cfPlan = Similarity.ivfNearDupPairs(df, "vec_id", "embedding", cents,
      threshold = 0.9, nProbe = 3, maxClusterSize = Int.MaxValue)
      .queryExecution.executedPlan.toString
    assert(!cfPlan.contains("Window"), s"cap-free ivf path still plans a Window:\n$cfPlan")
    assert(Similarity.suggestNCentroids(1000000L) == 1000)
    assert(Similarity.suggestNCentroids(10L) == 16)
  }

  test("two-level IVF: flat-probe bit parity, recall=1 vs brute at full probe, pruned recall") {
    val rng = new scala.util.Random(13)
    val centers = Array.fill(9)(Array.fill(8)(rng.nextGaussian()))
    val data = (0 until 270).map { i =>
      (i.toLong, centers(i % 9).map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding").repartition(4).cache()
    val sample = Similarity.sampleByKey(df, "vec_id", "embedding", 270)
    val tlc = Similarity.trainTwoLevel(sample, k1 = 3, k2 = 3)
    // with every coarse cell probed, the two-level probe must be
    // BIT-IDENTICAL to the flat probe over the full fine matrix (exactness
    // anchor for the pruned fast path)
    val flat = df.select(col("vec_id"),
      Similarity.probeClusters(col("embedding"), tlc.fineFlat, 2).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val two = df.select(col("vec_id"),
      Similarity.probeClustersTwoLevel(col("embedding"), tlc, nProbeCoarse = 3, nProbe = 2).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(flat == two, "two-level full probe diverged from flat probe")
    // near-dup at FULL probing finds exactly the brute-force pair set
    val nd = Similarity.ivfNearDupPairsTwoLevel(df, "vec_id", "embedding", tlc,
      threshold = 0.95, nProbeCoarse = 3, nProbe = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.max(math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum), 1e-12)
    }
    val brute = (for {
      (i, vi) <- all; (j, vj) <- all if i < j
      if BigDecimal(cos(vi, vj)).setScale(5, BigDecimal.RoundingMode.HALF_UP) >= 0.95
    } yield (i, j)).toSet
    assert(nd == brute, s"missing=${(brute -- nd).take(5)} extra=${(nd -- brute).take(5)}")
    // kNN at full probing == brute-force ranking
    val queries = df.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceKnn(df, queries, "vec_id", "embedding", 5)
      .collect().map(r => ((r.getLong(0), r.getInt(3)), r.getLong(1))).toMap
    val k2full = Similarity.ivfKnnTwoLevel(df, queries, "vec_id", "embedding", 5, tlc,
      nProbeCoarse = 3, nProbe = 9)
      .collect().map(r => ((r.getLong(0), r.getInt(3)), r.getLong(1))).toMap
    assert(k2full == bf, "two-level full-probe kNN diverged from brute force")
    // pruned probing still recalls most true neighbors on clustered data
    val pruned = Similarity.ivfKnnTwoLevel(df, queries, "vec_id", "embedding", 5, tlc,
      nProbeCoarse = 2, nProbe = 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfSet = bf.map { case ((q, _), n) => (q, n) }.toSet
    val recall = (bfSet & pruned).size.toDouble / bfSet.size
    info(s"two-level pruned recall = $recall")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("ivf knn has high recall vs brute force on clustered data") {
    // the driver-provided embeddings are isotropic random (no cluster
    // structure -> IVF recall is capped by scanned fraction there); build
    // clustered vectors to validate the operator itself
    val rng = new scala.util.Random(5)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian()))
    val data = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.15).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding").repartition(4).cache()
    val cents = Similarity.trainCentroids(df, "embedding", nCentroids = 8, sampleSize = 400)
    val queries = df.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceKnn(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfKnn(df, queries, "vec_id", "embedding", 10, cents, nProbe = 2)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    info(s"ivf recall=$recall")
    assert(recall >= 0.9, s"recall $recall")
  }

  test("ivf knn: mega-cluster salting is bit-identical to the unsalted join") {
    // one degenerate cluster of 60 near-identical vectors + a second small
    // cluster; cap 8 forces ceil(60/8)=8 salts on the hot cluster
    val rng = new scala.util.Random(31)
    val cA = Array.fill(8)(rng.nextGaussian())
    val cB = Array.fill(8)(rng.nextGaussian())
    val data = (0 until 60).map(i =>
      (i.toLong, cA.map(x => (x + rng.nextGaussian() * 0.01).toFloat).toSeq)) ++
      (100 until 110).map(i =>
        (i.toLong, cB.map(x => (x + rng.nextGaussian() * 0.01).toFloat).toSeq))
    val df = data.toDF("vec_id", "embedding").repartition(4).cache()
    val cents = Similarity.trainCentroidsFromSample(
      Array(cA, cB).map(v => { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }), 2, iters = 1)
    val queries = df.filter(col("vec_id") < 5 || col("vec_id") >= 100)
    def run(cap: Int) = Similarity.ivfKnn(df, queries, "vec_id", "embedding",
      k = 5, cents = cents, nProbe = 1, maxClusterSize = cap)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    val salted = run(8)
    val unsalted = run(1 << 20)
    assert(salted == unsalted, "salted top-k differs from unsalted")
    assert(salted.nonEmpty && salted.count(_._1 == 0L) == 5)
    // production shape: a persisted precomputed index serves identically
    val idx = Similarity.assignCorpus(df, "vec_id", "embedding", cents).cache()
    val viaIndex = Similarity.ivfKnnAssigned(idx, queries, "vec_id", "embedding",
      k = 5, cents = cents, nProbe = 1, maxClusterSize = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    idx.unpersist()
    assert(viaIndex == salted)
  }
}
