package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the model-based quality
  * filter of the CCNet/RefinedWeb recipe (there: a KenLM n-gram model;
  * here: an add-k-smoothed bigram LM trained ON a reference corpus with
  * this library's own distributed aggregations). Documents whose
  * per-token log-likelihood under the reference model is low are
  * boilerplate/gibberish/wrong-register candidates; the score composes
  * with [[TextOps.qualityScore]]'s shallow signals in curation gates.
  *
  * Semantics (mirrored exactly by the q_lm_score DuckDB oracle):
  * tokens = lowercase, trim, split on whitespace, drop empties; vocab =
  * top `vocabSize` reference tokens by (count desc, token asc — the
  * deterministic tie-break); out-of-vocab tokens map to ONE unk outcome
  * whose unigram count is the total OOV mass. With V vocab words,
  * O = V + 1 outcomes, N total reference tokens, and add-k smoothing:
  * first token scores ln((c1(w)+k)/(N+k*O)), each next token
  * ln((c2(prev,w)+k)/(c1(prev)+k*O)). Per-token ll = sum/n, 0.0 for
  * token-less docs. Perplexity = exp(-ll).
  *
  * Scale shape: training is two groupBy-count aggregations (unigrams,
  * idx-mapped bigrams via the native packed-key expression
  * [[graft.functions.LmBigramKeys]] — one long shuffle key, no vocab
  * join) — map-side combinable,
  * never a collect of raw rows; the model (<= V + bigram entries) ships
  * once per task as a reference object inside the codegen'd
  * [[graft.functions.LmScore]] expression, so scoring is a single map
  * stage over the corpus — no explode, no per-token shuffle.
  */
final class LmModel(val vocab: Array[String], val uniCounts: Array[Long],
                    val unkCount: Long, bigramKeys: Array[Long], bigramCounts: Array[Long],
                    val total: Long, val k: Double) extends Serializable {
  require(vocab.length == uniCounts.length, "vocab/count length mismatch")
  require(bigramKeys.length == bigramCounts.length, "bigram key/count mismatch")

  val vocabSize: Int = vocab.length
  private val outcomes: Double = vocabSize + 1.0 // vocab words + unk

  @transient private lazy val idx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { m.put(vocab(i), Integer.valueOf(i)); i += 1 }
    m
  }

  @transient private lazy val bi: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](bigramKeys.length * 2)
    var i = 0
    while (i < bigramKeys.length) {
      m.put(java.lang.Long.valueOf(bigramKeys(i)), java.lang.Long.valueOf(bigramCounts(i)))
      i += 1
    }
    m
  }

  /** (packed (i1<<32|i2) key, count) pairs — the persistence view. */
  def bigramPairs: Array[(Long, Long)] = bigramKeys.zip(bigramCounts)

  /** Vocab index, unk = vocabSize. */
  def indexOf(token: String): Int = {
    val v = idx.get(token)
    if (v == null) vocabSize else v.intValue()
  }

  private def cnt1(i: Int): Long = if (i == vocabSize) unkCount else uniCounts(i)

  private def cnt2(i1: Int, i2: Int): Long = {
    val v = bi.get(java.lang.Long.valueOf((i1.toLong << 32) | (i2.toLong & 0xFFFFFFFFL)))
    if (v == null) 0L else v.longValue()
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** (n_tokens, per-token log-likelihood); (0, 0.0) for token-less text. */
  def score(normText: String): (Int, Double) = {
    val toks = ws.split(normText, -1).filter(_.nonEmpty)
    if (toks.isEmpty) return (0, 0.0)
    var prev = indexOf(toks(0))
    var lp = math.log((cnt1(prev) + k) / (total + k * outcomes))
    var i = 1
    while (i < toks.length) {
      val cur = indexOf(toks(i))
      lp += math.log((cnt2(prev, cur) + k) / (cnt1(prev) + k * outcomes))
      prev = cur
      i += 1
    }
    (toks.length, lp / toks.length)
  }
}

object LangModel {

  private def toksCol(textCol: Column): Column =
    filter(split(trim(lower(textCol)), "\\s+"), w => length(w) > 0)

  /** Train on the reference frame: two distributed count aggregations,
    * a bounded top-`vocabSize` collect, and an idx-mapped bigram collect
    * (trimmed by `minBigramCount` — raise it at web scale to keep the
    * broadcast model small; absent bigrams back off to the k-floor).
    */
  def train(ref: DataFrame, textCol: String, vocabSize: Int = 65536,
            addK: Double = 0.5, minBigramCount: Long = 1L,
            maxModelBigrams: Long = 5000000L): LmModel = {
    val t = ref.select(toksCol(col(textCol)).as("ws"))
    val uni = t.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = uni.agg(coalesce(sum("c"), lit(0L))).collect()(0).getLong(0)
    val voc = uni.orderBy(desc("c"), asc("w")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    uni.unpersist()
    val unkCount = total - voc.map(_._2).sum
    // idx-mapped bigram counts through the native packed-key expression
    // (graft.functions.LmBigramKeys): one hash lookup per token instead of
    // a transform+struct lambda per bigram plus two BroadcastHashJoins
    // against a vocab frame, and the shuffle key narrows from two strings
    // to one long. The emitted keys are the exact packed
    // (idx(prev) << 32 | idx(cur)) longs the collect below previously
    // assembled, unseen/null tokens -> unkIdx = |vocab| as the left-join +
    // coalesce formulation produced (LangModelSpec pins the parity).
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    val keysCol = bridge.column(graft.functions.LmBigramKeys(
      bridge.expression(col("ws")), voc.map(_._1)))
    val bgGrouped = t.filter(size(col("ws")) >= 2)
      .select(explode(keysCol).as("key"))
      .groupBy("key").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minBigramCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fail fast BEFORE the collect: at web scale the idx-mapped bigram
    // table approaches (V+1)^2 entries at the defaults, which would blow
    // spark.driver.maxResultSize mid-collect with no diagnosable error
    // (the AutoFeat one-hot cardinality guard pattern)
    val nBigrams = bgGrouped.count()
    require(nBigrams <= maxModelBigrams,
      s"bigram model would hold $nBigrams entries (> maxModelBigrams=$maxModelBigrams); " +
        s"raise minBigramCount (currently $minBigramCount), lower vocabSize " +
        s"(currently $vocabSize), or raise maxModelBigrams explicitly")
    val bg = bgGrouped
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    bgGrouped.unpersist()
    new LmModel(voc.map(_._1), voc.map(_._2), unkCount,
      bg.map(_._1), bg.map(_._2), total, addK)
  }

  /** struct(n_tokens int, ll_per_token double) through the native
    * expression — one map stage, model as a reference object.
    */
  def scoreCol(text: Column, model: LmModel): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.LmScore(bridge.expression(text), model))
  }

  /** exp(-ll_per_token) convenience. */
  def perplexity(scoreStruct: Column): Column =
    exp(-scoreStruct.getField("ll_per_token"))

  /** Persist the model as TWO parquet tables under `path` (`meta` carries
    * vocab rows + totals, `bigrams` the packed keys) — parquet, not JSON:
    * a web-scale model holds millions of bigram rows, and parquet
    * round-trips longs/doubles exactly. Load with [[load]] in a fresh
    * session and serve without refitting.
    */
  def save(model: LmModel, path: String): Unit = {
    require(model.vocabSize > 0, "refusing to persist an empty-vocab model")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val meta = model.vocab.indices.map(i =>
      (i, model.vocab(i), model.uniCounts(i), model.unkCount, model.total, model.k))
    meta.toDF("i", "w", "c", "unk", "total", "k")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    model.bigramPairs.toSeq.toDF("key", "c")
      .write.mode("overwrite").parquet(s"$path/bigrams")
  }

  def load(path: String): LmModel = {
    val spark = org.apache.spark.sql.SparkSession.active
    val meta = spark.read.parquet(s"$path/meta")
      .orderBy("i").collect()
    require(meta.nonEmpty, s"empty LM meta at $path/meta")
    val vocab = meta.map(_.getString(1))
    val uni = meta.map(_.getLong(2))
    val bg = spark.read.parquet(s"$path/bigrams")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    new LmModel(vocab, uni, meta(0).getLong(3), bg.map(_._1), bg.map(_._2),
      meta(0).getLong(4), meta(0).getDouble(5))
  }
}
