package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011) — the embedding-COMPRESSION scale path: at
  * 100 TB the raw float corpus (4·dim bytes/vector) doesn't fit anywhere
  * useful, so vectors are stored as `m` one-byte codebook indices (dim=64
  * floats → 16 bytes at m=16: 16× smaller) and queries score codes via
  * asymmetric distance computation (ADC) — per-query lookup tables of
  * partial dots, one table build per query (k·dim multiplies), then each
  * corpus code costs m ADDS instead of dim multiply-adds.
  *
  * Training (like [[Pca]] / IVF): driver-side per-subspace Lloyd k-means
  * over a BOUNDED deterministic sample (top-`sampleSize` rows by id — a
  * distributed TakeOrdered, partitioning-independent), so the model is
  * reproducible across cluster sizes and the driver never holds more than
  * sample + m·k·subDim doubles. Encoding and ADC scoring ride as native
  * codegen'd expressions (model/LUTs as reference objects — the
  * LmScore/LangIdScore pattern): ONE map stage each, zero UDFs.
  *
  * Exactness anchor (pinned by PqSpec): with subDim=1 and codebooks that
  * contain every distinct per-dimension value, encode is lossless and ADC
  * reproduces the exact dot product BIT-FOR-BIT (same left-to-right
  * accumulation order as `vec_dot`) — the plumbing has a closed-form
  * correctness gate even though k-means itself isn't SQL-expressible
  * (the Pca precedent).
  */
object Pq {

  /** Trained codebooks: `codebooks(s)(c)` is the `subDim`-length centroid
    * `c` of subspace `s`. k ≤ 256 so codes fit one byte per subspace.
    */
  final class PqModel(val m: Int, val k: Int, val subDim: Int,
                      val codebooks: Array[Array[Array[Double]]]) extends Serializable {
    require(m >= 1 && subDim >= 1 && k >= 1 && k <= 256,
      "PQ needs 1 <= k <= 256 (one byte per subspace) and m, subDim >= 1")
    require(codebooks.length == m && codebooks.forall(_.length == k) &&
      codebooks.forall(_.forall(_.length == subDim)), "codebook shape mismatch")

    def dim: Int = m * subDim

    /** Nearest codebook entry per subspace (L2; ties → lower index). */
    def encode(v: Array[Double]): Array[Byte] = {
      require(v.length == dim, s"vector dim ${v.length} != model dim $dim")
      val out = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val cb = codebooks(s)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val t = v(s * subDim + i) - cb(c)(i)
            d += t * t
            i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best.toByte
        s += 1
      }
      out
    }

    /** Reconstruction (the centroid concatenation a code stands for). */
    def decode(code: Array[Byte]): Array[Double] = {
      require(code.length == m, s"code length ${code.length} != m $m")
      val out = new Array[Double](dim)
      var s = 0
      while (s < m) {
        System.arraycopy(codebooks(s)(code(s) & 0xFF), 0, out, s * subDim, subDim)
        s += 1
      }
      out
    }

    /** ADC lookup table for a query: `lut(s)(c)` = partial dot of the
      * query's subspace `s` slice with codebook entry `c`. Partial dots
      * accumulate left-to-right inside the subspace, so with subDim=1 the
      * full ADC sum reproduces `vec_dot`'s accumulation order exactly.
      */
    def lut(q: Array[Double]): Array[Array[Double]] = {
      require(q.length == dim, s"query dim ${q.length} != model dim $dim")
      Array.tabulate(m) { s =>
        Array.tabulate(k) { c =>
          var acc = 0.0
          var i = 0
          while (i < subDim) { acc += q(s * subDim + i) * codebooks(s)(c)(i); i += 1 }
          acc
        }
      }
    }

    /** ADC score: m table adds — the per-code cost of a PQ scan. */
    def adc(code: Array[Byte], table: Array[Array[Double]]): Double = {
      var acc = 0.0
      var s = 0
      while (s < m) { acc += table(s)(code(s) & 0xFF); s += 1 }
      acc
    }
  }

  /** Deterministic bounded RAW sample (top-`n` by id; no normalization —
    * PQ quantizes the vectors exactly as stored).
    */
  private def rawSample(df: DataFrame, idCol: String, vecCol: String, n: Int): Array[Array[Double]] =
    df.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(n).select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Train per-subspace codebooks with driver-side Lloyd iterations over
    * the bounded sample (init = first `k` sample sub-vectors, the
    * [[Similarity.trainCentroidsFromSample]] convention; empty clusters
    * keep their previous centroid).
    */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
            sampleSize: Int = 4096, iters: Int = 10): PqModel = {
    val sample = rawSample(df, idCol, vecCol, sampleSize)
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    require(sample.forall(_.length == dim), "ragged embedding widths in sample")
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { s =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      var cents = subs.take(k).map(_.clone)
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Long](k)
        subs.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0
            var i = 0
            while (i < subDim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }
    new PqModel(m, k, subDim, codebooks)
  }

  /** PQ code column (binary, m bytes) through the native expression
    * (null vector → null code).
    */
  def encodeCol(vec: Column, model: PqModel): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.PqEncode(bridge.expression(vec.cast("array<double>")), model))
  }

  /** Corpus frame → (idCol, code) — the compressed store a 100 TB pipeline
    * persists instead of raw floats.
    */
  def encodeCorpus(df: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame =
    df.select(col(idCol), encodeCol(col(vecCol), model).as("code"))

  /** Approximate top-k by ADC over a PQ-coded corpus for a BOUNDED query
    * set (collected driver-side with a fail-fast guard — the
    * bruteForceKnn broadcast contract made explicit). One corpus scan:
    * codes join the broadcast query ids, each (code, query) pair costs m
    * table adds inside codegen. Output: (query_id, neighbor_id, adc, rank)
    * with ties broken by neighbor id.
    */
  def adcKnn(corpusCodes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, model: PqModel, maxQueries: Int = 4096): DataFrame = {
    val qRows = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    require(qRows.length <= maxQueries,
      s"${qRows.length} queries exceeds maxQueries=$maxQueries — ADC LUTs are " +
        "driver-built per query; batch larger query sets")
    val luts = new java.util.HashMap[Long, Array[Array[Double]]](qRows.length * 2)
    qRows.foreach(r => luts.put(r.getLong(0), model.lut(r.getSeq[Double](1).toArray)))
    require(luts.size == qRows.length,
      "duplicate query ids — the per-query LUT map would silently keep one embedding")
    val spark = corpusCodes.sparkSession
    import spark.implicits._
    val qdf = broadcast(qRows.map(_.getLong(0)).toSeq.toDF("query_id"))
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    val scored = corpusCodes.select(col(idCol).as("neighbor_id"), col("code"))
      .join(qdf, col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", bridge.column(graft.functions.PqAdc(
        bridge.expression(col("code")), bridge.expression(col("query_id")), model.m, luts)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("adc"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc", "rank")
  }

  /** Materialize the IVFADC index (FAISS `IndexIVFPQ`): each vector is
    * assigned to its nearest coarse centroid (the [[Similarity]] spherical
    * convention — argmax dot, executor-side via the codegen'd probe
    * expression) AND compressed to its PQ code, in ONE map stage. At
    * production scale this is computed once, persisted/written, and served
    * against for many query batches.
    */
  def encodeCorpusIvf(df: DataFrame, idCol: String, vecCol: String, model: PqModel,
                      cents: Array[Array[Double]]): DataFrame =
    df.select(col(idCol), Similarity.clusterCol(col(vecCol), cents).as("__cluster"),
      encodeCol(col(vecCol), model).as("code"))

  /** IVFADC search: probe the `nProbe` coarse clusters nearest each query,
    * ADC-score ONLY the codes in those clusters — scan cost drops to
    * ~nProbe/nCentroids of the (already 16×-compressed) corpus per query
    * batch. Query-side probe sets and LUTs are driver-built for the
    * bounded query batch and ride one broadcast; the corpus side is ONE
    * filtered scan of the code table (join on cluster id against the tiny
    * (query × nProbe)-row broadcast), never a corpus shuffle. With
    * `nProbe = cents.length` the pruning is a no-op and results are
    * IDENTICAL to [[adcKnn]] (pinned by PqSpec). Chain with
    * [[adcKnnRerank]]'s raw-vector join for exact final scores.
    */
  def ivfAdcKnn(corpusCodesIvf: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, model: PqModel, cents: Array[Array[Double]],
                nProbe: Int = 2, maxQueries: Int = 4096): DataFrame = {
    require(nProbe >= 1 && nProbe <= cents.length, s"nProbe must be in [1, ${cents.length}]")
    val qRows = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    require(qRows.length <= maxQueries,
      s"${qRows.length} queries exceeds maxQueries=$maxQueries")
    val luts = new java.util.HashMap[Long, Array[Array[Double]]](qRows.length * 2)
    val probes = qRows.map { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Double](1).toArray
      luts.put(qid, model.lut(q))
      // same spherical convention as clusterCol: maximize dot(q, c); ties
      // keep the lower centroid index (stable sort on (-dot, idx))
      val scored = cents.indices.map { c =>
        var d = 0.0
        var i = 0
        while (i < q.length) { d += q(i) * cents(c)(i); i += 1 }
        (-d, c)
      }.sorted.take(nProbe).map(_._2)
      qid -> scored
    }
    require(luts.size == qRows.length,
      "duplicate query ids — the per-query LUT map would silently keep one embedding")
    val spark = corpusCodesIvf.sparkSession
    import spark.implicits._
    val qdf = broadcast(probes.toSeq.flatMap { case (qid, cls) =>
      cls.map(c => (qid, c))
    }.toDF("query_id", "__cluster"))
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    val scored = corpusCodesIvf.select(col(idCol).as("neighbor_id"),
        col("__cluster"), col("code"))
      .join(qdf, Seq("__cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", bridge.column(graft.functions.PqAdc(
        bridge.expression(col("code")), bridge.expression(col("query_id")), model.m, luts)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("adc"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc", "rank")
  }

  /** ADC shortlist + EXACT cosine re-rank (the standard PQ serving shape:
    * the compressed scan finds `shortlist` candidates per query, then only
    * those — queries × shortlist rows, a broadcastable sliver of the
    * corpus — fetch their raw vectors for exact scoring). Recall approaches
    * brute force at PQ scan cost; the raw corpus is touched only by an
    * id-equi-join on the candidate set. Output:
    * (query_id, neighbor_id, cosine, rank) — [[Similarity.bruteForceKnn]]'s
    * contract, ties by neighbor id.
    */
  def adcKnnRerank(corpusCodes: DataFrame, corpusRaw: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int, model: PqModel,
                   shortlist: Int = 100, maxQueries: Int = 4096): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val cand = adcKnn(corpusCodes, queries, idCol, vecCol, shortlist, model, maxQueries)
      .select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("__qv"), Similarity.norm(col(vecCol)).as("__qn")))
    // candidates are queries*shortlist rows — broadcast THEM into the raw
    // corpus scan so the big side never shuffles
    val raw = corpusRaw.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      Similarity.norm(col(vecCol)).as("__cn"))
    val scored = raw.join(broadcast(cand), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("cosine", Similarity.dot(col("__qv"), col("__cv")) /
        greatest(col("__qn") * col("__cn"), lit(1e-12)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
