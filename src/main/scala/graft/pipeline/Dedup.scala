package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Everything is built to be
  * LINEAR in corpus size: exact dedup is a hash-groupBy on a fingerprint;
  * near-dup candidate generation goes through MinHash+LSH band buckets (a
  * groupBy join on band keys), never all-pairs. Hashes are md5-derived so
  * the DuckDB oracle can reproduce them bit-for-bit.
  */
object Dedup {

  /** 63-bit hash h_i(s) = int(md5(i|s)[0:15 hex]); same formula is
    * expressible in DuckDB for the oracle.
    */
  private def h(i: Int, s: Column): Column =
    conv(substring(md5(concat(lit(i.toString), lit("|"), s)), 1, 15), 16, 10).cast("long")

  /** Exact dedup: keep the smallest id per normalized-text fingerprint.
    * Returns (id, fingerprint, is_canonical, dup_count).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol)).as("fingerprint")
    df.select(col(idCol), fp)
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .select(explode(col("ids")).as(idCol), col("fingerprint"),
        (col(idCol) === col("canonical_id")).as("is_canonical"), col("dup_count"))
  }

  /** Character k-shingles of the normalized text. */
  def shingles(text: Column, k: Int = 5): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k))
    ))
  }

  /** Word n-grams of the text (n consecutive tokens joined by one space). */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(lower(text))
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))
    ))
  }

  /** MinHash signature (numHashes values) over word n-gram shingles. */
  def minhashSignature(text: Column, numHashes: Int = 16, n: Int = 3): Column = {
    val sh = wordNgrams(text, n)
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s =>
        conv(substring(md5(concat(lit(i.toString), lit("|"), s)), 1, 15), 16, 10).cast("long")))
    }: _*)
  }

  /** LSH candidate pairs: signatures split into `bands` bands; documents
    * sharing any band bucket become a candidate pair (id1 < id2).
    * Output: (id1, id2) distinct. Linear scan + groupBy on band keys.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, bands: Int = 4, n: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(col(textCol), numHashes, n)
    val banded = df.select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"), posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => concat_ws("_", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
      )).as(Seq("band", "bucket")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** n-gram Jaccard similarity for given candidate pairs (id1, id2). */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val g = docs.select(col(idCol).as("__id"), wordNgrams(col(textCol), n).as("__grams"))
    pairs
      .join(g.withColumnRenamed("__id", "id1").withColumnRenamed("__grams", "g1"), "id1")
      .join(g.withColumnRenamed("__id", "id2").withColumnRenamed("__grams", "g2"), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("g1"), col("g2"))).cast("double") /
          greatest(size(array_union(col("g1"), col("g2"))).cast("double"), lit(1.0)))
      .select("id1", "id2", "jaccard")
  }

  /** 32-bit SimHash over tokens: bit b is 1 iff the weighted sum of token
    * hash bits at position b is positive. Pure expressions (no UDF).
    */
  def simhash(text: Column, bits: Int = 32): Column = {
    val tokenHashes = transform(TextOps.tokens(lower(text)), t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    (0 until bits).map { b =>
      val bitSum = aggregate(tokenHashes, lit(0L),
        (acc, th) => acc + when(shiftright(th, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
