package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph dedup: first occurrence wins globally, documents
  * reassemble in original line order, counts are exact.
  */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-document suppression: first (id, idx) occurrence wins") {
    val docs = Seq(
      (1L, "alpha\nshared chrome\nbeta"),
      (2L, "shared chrome\ngamma"),         // chrome already seen in doc 1
      (3L, "gamma\nalpha\ndelta")           // both seen earlier
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "alpha\nshared chrome\nbeta", 3L, 0L),
      (2L, "gamma", 1L, 1L),
      (3L, "delta", 1L, 2L)))
  }

  test("normalization matches only; surviving lines keep original bytes") {
    val docs = Seq(
      (1L, "The   Quick brown FOX"),
      (2L, "the quick  brown fox"),          // same fingerprint, different bytes
      (3L, "  the quick brown fox  \nnew content")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "The   Quick brown FOX", 1L, 0L), // original bytes preserved
      (2L, "", 0L, 1L),                      // fully deduplicated, still present
      (3L, "new content", 1L, 1L)))
  }

  test("blank lines vanish without counting; whitespace-only docs survive empty") {
    val docs = Seq(
      (1L, "a\n\n   \nb"),
      (2L, "   ")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq((1L, "a\nb", 2L, 0L), (2L, "", 0L, 0L)))
    assert(Dedup.paragraphDedup(docs.limit(0), "doc_id", "text").count() === 0)
  }

  test("duplicate lines WITHIN one document also collapse to the first") {
    val docs = Seq((7L, "x\ny\nx\nx\nz")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq((7L, "x\ny\nz", 3L, 2L)))
  }

  test("plan shape: NO per-fingerprint window sort (boilerplate-skew immunity)") {
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = Dedup.paragraphDedup(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // first-occurrence selection must be an aggregate (map-side combinable),
    // never a window: a window sorts every copy of a hot boilerplate line
    // inside one task at corpus scale
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate") ||
      plan.contains("ObjectHashAggregate"), s"expected an aggregate in:\n$plan")
  }
}
