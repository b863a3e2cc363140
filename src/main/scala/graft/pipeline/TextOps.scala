package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristic, fingerprinting. All
  * pure Catalyst expressions (codegen'd, shuffle-free per row) so a 100 TB
  * documents scan stays a single map stage with full column pruning.
  */
object TextOps {

  /** Whitespace tokens (reference point for all token-based ops). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + extra units for long words
    * (a word of length L costs ceil(L/4) units).
    */
  def subwordCountEst(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  def charCount(text: Column): Column = length(text).cast("long")

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def upperRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text).cast("double"), lit(1.0))

  private val enStop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "that", "it", "for", "on", "with")

  def stopwordRatio(text: Column, stopwords: Seq[String] = enStop): Column = {
    val stopArr = array(stopwords.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(stopArr, t))).cast("double") /
      greatest(tokenCount(text).cast("double"), lit(1.0))
  }

  /** Composite quality score in [0,1]: length sweet-spot, punctuation
    * sanity, stopword presence, mean word length sanity. Deterministic and
    * SQL-mirrorable (see SparkEntry oracle).
    *
    * Fast path: the native single-pass `quality_score` expression when the
    * session carries GraftExtensions (bit-identical — pinned by
    * TextScoreExprsSpec); the declarative formulation below pays six regex
    * executions + three splits + an interpreted stopword filter per row.
    */
  def qualityScore(text: Column): Column = {
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    if (active.exists(_.catalog.functionExists("quality_score")))
      return call_function("quality_score", text)
    qualityScoreBuiltin(text)
  }

  /** The declarative formulation — the parity oracle for the native
    * expression (TextScoreExprsSpec compares them value-for-value).
    */
  private[graft] def qualityScoreBuiltin(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / 20.0, lit(1.0)) * when(n > 5000, 0.5).otherwise(1.0)
    val punct = punctRatio(text)
    val punctScore = when(punct > 0.2, 0.3).otherwise(1.0)
    val wl = meanWordLen(text)
    val wlScore = when(wl < 2.0 || wl > 12.0, 0.5).otherwise(1.0)
    val stopScore = lit(0.5) + least(stopwordRatio(text) * 5.0, lit(0.5))
    round(lenScore * punctScore * wlScore * stopScore, 6)
  }

  /** n-gram/stopword language-ID heuristic: argmax of per-language marker
    * hits (tiny marker lists; real deployments swap in fastText-style
    * models — the operator shape stays one scan + one argmax projection).
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "que", "de", "es"),
    "fr" -> Seq("le", "la", "et", "est", "les")
  )

  def langIdHeuristic(text: Column): Column = {
    // native one-walk argmax (bit-identical; the declarative fold below
    // re-evaluates every per-language filter inside every when branch)
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    if (active.exists(_.catalog.functionExists("langid_heuristic")))
      return call_function("langid_heuristic", text)
    langIdHeuristicBuiltin(text)
  }

  /** Declarative formulation — the native expression's parity oracle. */
  private[graft] def langIdHeuristicBuiltin(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = markers.map { case (lang, ws) =>
      val arr = array(ws.map(lit): _*)
      (lang, size(filter(toks, t => array_contains(arr, t))))
    }
    // argmax with first-wins tie-break in marker order, 'und' if all zero
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s > lit(0) && scores.filter(_._1 != lang).map(x => s >= x._2).reduce(_ && _), lit(lang))
        .otherwise(acc)
    }
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — the key for exact dedup at scale (hash-groupBy, no pairwise).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  // -------------------------------------------- PII redaction
  /** Conservative ASCII patterns chosen to evaluate identically under Java
    * regex (Spark) and RE2 (DuckDB oracles): no \w/\b/lookaround, explicit
    * character classes only.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val urlPattern = "https?://[^ \\t\\n]+"
  val ipPattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redact emails, then URLs, then IPv4 literals (fixed order — a URL
    * containing an email-shaped userinfo is redacted as the email first,
    * deterministically on both engines). Pure chained regexp_replace: the
    * 100 TB scrub stays a single map stage.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        urlPattern, "<URL>"),
      ipPattern, "<IP>")

  /** Match counts per category on the RAW text (email counted before any
    * replacement, mirroring [[redact]]'s order).
    */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(emailPattern), lit(0))).cast("long").as("n_emails"),
    size(regexp_extract_all(text, lit(urlPattern), lit(0))).cast("long").as("n_urls"),
    size(regexp_extract_all(text, lit(ipPattern), lit(0))).cast("long").as("n_ips"))

  // -------------------------------------------- repetition (Gopher-style)
  /** Fraction of non-empty (trimmed) lines that are duplicates of an
    * earlier line — the classic boilerplate/navigation-chrome signal.
    * 0.0 for documents with no non-empty lines.
    */
  def dupLineRatio(text: Column): Column = {
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    if (active.exists(_.catalog.functionExists("dup_line_ratio")))
      call_function("dup_line_ratio", text)
    else {
      val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
      when(size(lines) <= 0, lit(0.0)).otherwise(
        (size(lines) - size(array_distinct(lines))).cast("double") /
          size(lines).cast("double"))
    }
  }

  /** Fraction of tokens taken by the single most frequent (lowercased)
    * token — degenerate keyword-stuffed or repeated-word documents score
    * near 1. O(distinct · tokens) per row in pure HOFs (no shuffle);
    * 0.0 for empty documents.
    */
  def topWordRatio(text: Column): Column = {
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    if (active.exists(_.catalog.functionExists("top_word_ratio")))
      call_function("top_word_ratio", text)
    else {
      val toks = filter(tokens(lower(text)), t => length(t) > 0)
      when(size(toks) <= 0, lit(0.0)).otherwise(
        array_max(transform(array_distinct(toks),
          w => size(filter(toks, t => t === w)))).cast("double") /
          size(toks).cast("double"))
    }
  }
}
