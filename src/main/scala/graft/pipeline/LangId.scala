package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained language identification: a char-n-gram multinomial naive-Bayes
  * classifier (the CCNet-style filter shape) learned with this library's
  * own aggregations — the credible upgrade over
  * [[TextOps.langIdHeuristic]]'s marker words, which stays available as the
  * vocab-free fallback.
  *
  * Model: for each language l, log P(l) (document prior) and add-α-smoothed
  * gram log-probabilities log P(g|l) = ln((c_lg + α) / (T_l + α(V+1))) over
  * a bounded top-V gram vocabulary; out-of-vocab grams take the unseen term
  * ln(α / (T_l + α(V+1))). A document scores
  * ll(l) = log P(l) + Σ_grams log P(g|l); the prediction is the argmax over
  * the ROUNDED ll (6 digits, ties to the lexicographically smaller
  * language) so engine-level FP accumulation differences cannot flip the
  * winner between Spark and a SQL oracle (the q_knn rounding defense).
  *
  * Grams are code-point substrings of the LOWERCASED text (Spark
  * `lower`/`substring`/`length` and DuckDB `lower`/`substr`/`len` all count
  * code points — the repo's code-point parity rule), including whitespace
  * (word boundaries carry signal).
  *
  * Scale shape (100 TB): training is ONE corpus scan exploded to grams →
  * two map-side-combinable aggregates (top-V vocab TakeOrdered + per-(lang,
  * gram) counts behind a broadcast vocab semi-join); the collected model is
  * bounded by langs×V with a fail-fast language-count guard (the LM-bigram
  * pattern). Scoring rides as ONE codegen'd reference-object expression —
  * a single map stage, zero UDFs, zero shuffles.
  */
object LangId {

  /** Serializable trained model (rides as a codegen reference object). */
  final class LangIdModel(val langs: Array[String], val logPrior: Array[Double],
                          val n: Int, val unseenLogProb: Array[Double],
                          gramLogProb: java.util.HashMap[String, Array[Double]])
      extends Serializable {
    require(langs.nonEmpty && langs.length == logPrior.length &&
      langs.length == unseenLogProb.length)

    def vocabSize: Int = gramLogProb.size()

    /** Stable-order view of the gram table (for persistence). */
    def gramEntries: Seq[(String, Array[Double])] = {
      val out = Vector.newBuilder[(String, Array[Double])]
      gramLogProb.forEach((g, arr) => out += ((g, arr)))
      out.result().sortBy(_._1)
    }

    def gramLog(gram: String): Array[Double] = {
      val v = gramLogProb.get(gram)
      if (v == null) unseenLogProb else v
    }

    /** (predicted language, winning rounded log-likelihood). `text` must
      * already be lowercased by the caller (the expression lowercases with
      * UTF8String.toLowerCase = Spark's `lower`).
      */
    def score(text: String): (String, Double) = {
      val ll = logLikelihoods(text)
      var best = 0
      var bestR = round6(ll(0))
      var l = 1
      while (l < ll.length) {
        val r = round6(ll(l))
        if (r > bestR) { best = l; bestR = r } // ties keep the smaller index
        l += 1
      }
      (langs(best), bestR)
    }

    /** Raw per-class log-likelihoods in `langs` order. `text` must already
      * be lowercased (the [[score]] contract).
      */
    def logLikelihoods(text: String): Array[Double] = {
      val ll = logPrior.clone()
      // code-point gram walk (UTF-16 surrogate pairs stay whole)
      val cps = new Array[Int](text.length + 1)
      var m = 0
      var off = 0
      while (off < text.length) {
        cps(m) = off
        off += Character.charCount(text.codePointAt(off))
        m += 1
      }
      cps(m) = text.length
      var i = 0
      while (i + n <= m) {
        val g = gramLog(text.substring(cps(i), cps(i + n)))
        var l = 0
        while (l < ll.length) { ll(l) += g(l); l += 1 }
        i += 1
      }
      ll
    }

    /** round6(ll(pos)) - round6(ll(neg)) — the two-class decision margin.
      * Rounding each class BEFORE subtracting keeps the value reproducible
      * across engines (the rounded-argmax defense, applied to a margin).
      */
    def margin(text: String, posIdx: Int, negIdx: Int): Double = {
      val ll = logLikelihoods(text)
      round6(ll(posIdx)) - round6(ll(negIdx))
    }

    def labelIndex(lang: String): Int = {
      val i = langs.indexOf(lang)
      require(i >= 0, s"label '$lang' not in model classes ${langs.mkString(",")}")
      i
    }
  }

  /** HALF_UP at 6 digits — Spark `round` / DuckDB `ROUND` semantics. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Code-point n-gram column of the (already lowercased) text — empty
    * array below n code points (a bare `sequence(1, len-n+1)` would count
    * DOWN for short strings).
    */
  private def gramsCol(lowered: Column, n: Int): Column =
    when(length(lowered) >= n,
      transform(sequence(lit(1), length(lowered) - (n - 1)),
        i => lowered.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Train on a labeled frame: `labelCol` is the language string. NULL
    * texts/labels are excluded (scoring null-propagates to match).
    */
  def train(df: DataFrame, textCol: String, labelCol: String, n: Int = 2,
            vocabSize: Int = 4096, alpha: Double = 0.5,
            maxLangs: Int = 64): LangIdModel = {
    require(n >= 1 && vocabSize >= 1 && alpha > 0)
    val d = df.select(lower(col(textCol)).as("t"), col(labelCol).cast("string").as("lang"))
      .filter(col("t").isNotNull && col("lang").isNotNull)
    // document priors; fail-fast guard bounds every collect below
    val priRows = d.groupBy("lang").agg(count(lit(1)).as("nd")).orderBy("lang").collect()
    require(priRows.nonEmpty, "langid training set is empty")
    require(priRows.length <= maxLangs,
      s"${priRows.length} languages exceeds maxLangs=$maxLangs — refusing an unbounded model collect")
    val langs = priRows.map(_.getString(0))
    val nDocs = priRows.map(_.getLong(1)).sum
    val logPrior = priRows.map(r => math.log(r.getLong(1).toDouble / nDocs))
    // ONE gram-explode pass: the per-(lang, gram) count aggregate is
    // map-side combinable and its cardinality is bounded by langs × the
    // gram alphabet (char n-grams: thousands), so vocab selection and the
    // in-vocab count join both run over this tiny cached frame instead of
    // re-exploding the corpus (the second explode was the dominant
    // training cost at bench scale)
    val pairCounts = d.select(col("lang"), explode(gramsCol(col("t"), n)).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded top-V vocabulary: TakeOrdered over the global gram counts
      // (count desc, gram asc — deterministic under ties)
      val vocab = pairCounts.groupBy("gram").agg(sum("c").as("tc"))
        .orderBy(desc("tc"), asc("gram")).limit(vocabSize)
        .select("gram").collect().map(_.getString(0))
      val spark = df.sparkSession
      import spark.implicits._
      val vdf = broadcast(vocab.toSeq.toDF("gram"))
      // collect is bounded by langs × V (≤ maxLangs × vocabSize by the guards)
      val cntRows = pairCounts.join(vdf, "gram")
        .select(col("lang"), col("gram"), col("c")).collect()
      val li = langs.zipWithIndex.toMap
      val totals = new Array[Double](langs.length)
      cntRows.foreach(r => totals(li(r.getString(0))) += r.getLong(2).toDouble)
      val denom = totals.map(t => t + alpha * (vocab.length + 1))
      val unseen = denom.map(dn => math.log(alpha / dn))
      val map = new java.util.HashMap[String, Array[Double]](vocab.length * 2)
      cntRows.foreach { r =>
        val l = li(r.getString(0))
        val arr = map.computeIfAbsent(r.getString(1), _ => unseen.clone())
        arr(l) = math.log((r.getLong(2) + alpha) / denom(l))
      }
      new LangIdModel(langs, logPrior, n, unseen, map)
    } finally pairCounts.unpersist(blocking = false)
  }

  /** struct(lang, ll) scoring column through the native codegen'd
    * expression (null text → null struct).
    */
  def scoreCol(text: Column, model: LangIdModel): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.LangIdScore(bridge.expression(text), model))
  }

  /** Predicted-language column alone. */
  def predictCol(text: Column, model: LangIdModel): Column =
    scoreCol(text, model).getField("lang")

  /** Persist the trained model as parquet (train once, serve refit-free —
    * the LangModel.save pattern). Doubles round-trip bit-exactly.
    */
  def save(model: LangIdModel, path: String): Unit = {
    require(model.langs.nonEmpty, "refusing to persist an empty model")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    model.langs.indices.map(i =>
        (i, model.langs(i), model.logPrior(i), model.unseenLogProb(i), model.n))
      .toDF("i", "lang", "log_prior", "unseen", "n")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    model.gramEntries.map { case (g, arr) => (g, arr.toSeq) }
      .toDF("gram", "probs")
      .write.mode("overwrite").parquet(s"$path/grams")
  }

  def load(path: String): LangIdModel = {
    val spark = org.apache.spark.sql.SparkSession.active
    val meta = spark.read.parquet(s"$path/meta").orderBy("i").collect()
    require(meta.nonEmpty, s"empty langid meta at $path/meta")
    val langs = meta.map(_.getString(1))
    val prior = meta.map(_.getDouble(2))
    val unseen = meta.map(_.getDouble(3))
    val map = new java.util.HashMap[String, Array[Double]]()
    spark.read.parquet(s"$path/grams").collect().foreach { r =>
      map.put(r.getString(0), r.getSeq[Double](1).toArray)
    }
    new LangIdModel(langs, prior, meta(0).getInt(4), unseen, map)
  }
}
