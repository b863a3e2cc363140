package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowed fingerprints + substring-level dedup: expression parity vs a
  * plain-Scala mirror of the MOSS rule, the (w+k-1) sharing guarantee,
  * span semantics (first occurrence wins, within-doc repeats flagged),
  * and text reconstruction invariants.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 20
  private val W = 8

  /** Plain-Scala mirror of WinnowExpr's intended semantics: space-only trim
    * (Spark/DuckDB trim ' ' only — Java String.trim would also strip
    * tabs/newlines and shift every position) and code-point units.
    */
  private def mirror(text: String, k: Int = K, w: Int = W): Seq[(Int, Long)] = {
    val spaceTrimmed = text.toLowerCase
      .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val norm = spaceTrimmed.replaceAll("\\s+", " ")
    val cps = norm.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return Seq.empty
    val h = (0 until n).map(i =>
      graft.functions.SrpSketch.md5Top60(new String(cps, i, k)))
    val sel = scala.collection.mutable.LinkedHashSet.empty[Int]
    if (n < w) {
      sel += h.indexOf(h.min)
    } else {
      for (j <- 0 to n - w) {
        val win = h.slice(j, j + w)
        sel += j + win.indexOf(win.min)
      }
    }
    sel.toSeq.sorted.map(p => (p, h(p)))
  }

  test("winnow expression matches the plain-Scala mirror on corpus docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, a) => id -> a.map(t => (t._2, t._3)).toSeq.sorted }
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet.nonEmpty)
    for ((id, fps) <- got) assert(fps === mirror(texts(id)), s"doc $id")
    // docs with no fingerprints (shorter than k) simply don't appear
    for ((id, t) <- texts if !got.contains(id)) assert(mirror(t).isEmpty, s"doc $id")
  }

  test("guarantee: docs sharing a substring of length >= w+k-1 share a fingerprint") {
    val shared = "zq xv jk wp mn bt cd fg hl rs tu yz ab ce di fo gu" // 51 chars > W+K-1
    val texts = Seq(
      s"left padding words here $shared",
      s"$shared and completely different tail content follows",
      s"unrelated middle $shared unrelated end")
    for (Seq(a, b) <- texts.combinations(2)) {
      val ha = mirror(a).map(_._2).toSet
      val hb = mirror(b).map(_._2).toSet
      assert(ha.intersect(hb).nonEmpty, s"no shared fingerprint between '$a' and '$b'")
    }
  }

  test("duplicateSpans: first occurrence wins; later doc gets the span") {
    val x = "the quick brown fox jumps over the lazy dog again and again tonight"
    val df = Seq(
      (1L, s"alpha $x"),
      (2L, s"totally fresh beginning $x plus an original ending here"),
      (3L, "no overlap with anything else at all in this one truly")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.nonEmpty)
    assert(spans.forall(_._1 == 2L), s"only doc 2 repeats content, got $spans")
    val norm2 = s"totally fresh beginning $x plus an original ending here"
    spans.foreach { case (_, s, e) => assert(s >= 0 && e <= norm2.length && s < e) }
  }

  test("within-document repetition is flagged too") {
    val phrase = "repeated boilerplate sentence that goes on for quite a while here"
    val df = Seq((1L, s"$phrase some middle filler words $phrase")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", K, W).collect()
    assert(spans.nonEmpty)
    // the span lies in the second half (first occurrence kept)
    assert(spans.map(_.getLong(1)).min >= phrase.length - K)
  }

  test("substringDedup: reconstruction invariants on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") < 120).select("doc_id", "text")
    val out = Dedup.substringDedup(docs, "doc_id", "text", K, W)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val norms = docs.select(col("doc_id"), Dedup.normalizeWs(col("text")).as("nm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === norms.keySet) // every doc present
    var removedTotal = 0L
    for ((id, (clean, removed)) <- out) {
      assert(clean.length + removed === norms(id).length, s"doc $id length bookkeeping")
      removedTotal += removed
    }
    assert(removedTotal > 0, "word-soup corpus must contain duplicated substrings")
    // span-free docs pass through byte-identical
    val spanned = Dedup.duplicateSpans(docs, "doc_id", "text", K, W)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    for ((id, (clean, removed)) <- out if !spanned.contains(id)) {
      assert(removed === 0L && clean === norms(id), s"doc $id should be untouched")
    }
  }

  test("astral-plane text: positions are code points, so spans cut correctly") {
    // the emoji is 2 UTF-16 units but ONE position unit everywhere
    // (WinnowExpr, Spark substring/length, DuckDB substr/len)
    val x = "the exact same long duplicated sentence appears in both documents"
    val df = Seq((1L, s"first copy here $x"),
                 (2L, s"😀😀 emoji prefix then $x tail")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text", K, W)
      .filter(col("doc_id") === 2L).collect().map(r => (r.getInt(1), r.getLong(2)))
    val texts = Map(2L -> s"😀😀 emoji prefix then $x tail")
    assert(fps.toSeq.sorted === mirror(texts(2L)), "expression must count code points")
    val out = Dedup.substringDedup(df, "doc_id", "text", K, W)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val norm2 = Dedup.normalizeWs(lit(texts(2L)))
    val nm2 = df.sparkSession.range(1).select(norm2).collect()(0).getString(0)
    // bookkeeping in code points: cleaned length + removed == normalized length
    assert(out(2L)._1.codePointCount(0, out(2L)._1.length) + out(2L)._2 ===
      nm2.codePointCount(0, nm2.length))
    assert(out(2L)._2 > 0, "the duplicated sentence must be flagged in doc 2")
    // the cut never slices through a surrogate pair: a lone surrogate would
    // not round-trip through UTF-8
    val clean2 = out(2L)._1
    assert(new String(clean2.getBytes("UTF-8"), "UTF-8") === clean2)
    assert(out(1L)._2 === 0L, "first occurrence wins")
  }

  test("plan shape: duplicate detection is aggregate+join; only per-DOC windows") {
    val docs = Seq((1L, "some text for the plan shape probe only")).toDF("doc_id", "text")
    val plan = Dedup.duplicateSpans(docs, "doc_id", "text", K, W)
      .queryExecution.executedPlan.toString
    // the per-fingerprint stage must be a map-side-combinable aggregate +
    // a join (AQE can skew-split a join; it cannot split a window over a
    // hot boilerplate gram). The ONLY windows allowed are the island-merge
    // ones partitioned by doc_id (bounded by document length).
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), s"expected the fingerprint aggregate in:\n$plan")
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.forall(_.contains("doc_id")),
      s"non-doc-partitioned window in:\n${windowSpecs.mkString("\n")}")
  }

  test("docs shorter than k survive untouched; n < w selects one fingerprint") {
    val df = Seq((1L, "tiny"), (2L, "exactly twenty-two ch")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(!fps.exists(_._1 == 1L))
    assert(fps.count(_._1 == 2L) === 1) // 21 chars -> 2 grams -> n < w -> one min
    val out = Dedup.substringDedup(df, "doc_id", "text", K, W)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === ("tiny", 0L))
    assert(out(2L)._2 === 0L)
  }
}
