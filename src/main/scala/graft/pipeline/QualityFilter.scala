package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering (the FineWeb / CCNet "train a classifier,
  * filter by its score" stage): a two-class char-n-gram naive-Bayes
  * classifier distinguishing HIGH- from LOW-quality text, trained on WEAK
  * labels derived from the heuristic [[TextOps.qualityScore]] — the
  * standard bootstrap when no human labels exist (label cheaply, learn a
  * smoother model, filter on its margin). Reuses the [[LangId]] NB
  * machinery end-to-end (training aggregations, bounded model collect,
  * codegen'd scoring), so the scale shape is identical: ONE training scan
  * with map-side-combinable aggregates, scoring as ONE codegen'd map
  * stage, zero shuffles at serve time.
  *
  * The filter score is the DECISION MARGIN round6(ll_hi) - round6(ll_lo)
  * (each class rounded before subtracting — the rounded-argmax defense
  * applied to a margin, so a SQL oracle reproduces the value exactly);
  * positive = the model prefers "hi". Thresholding the margin (rather
  * than the argmax) gives callers a precision/recall dial.
  */
object QualityFilter {

  val HiLabel = "hi"
  val LoLabel = "lo"

  /** Weak label from the heuristic score: "hi" iff
    * qualityScore >= threshold; null text → null label (excluded from
    * training by [[LangId.train]]'s filter).
    */
  def weakLabelCol(text: Column, threshold: Double = 0.5): Column =
    when(text.isNull, lit(null).cast("string"))
      .when(TextOps.qualityScore(text) >= threshold, HiLabel)
      .otherwise(LoLabel)

  /** Train on weak labels. Fails fast when the corpus is degenerate (one
    * class only) — a margin needs both classes.
    */
  def train(df: DataFrame, textCol: String, threshold: Double = 0.5, n: Int = 2,
            vocabSize: Int = 4096, alpha: Double = 0.5): LangId.LangIdModel = {
    val labeled = df.select(col(textCol).as("__text"),
      weakLabelCol(col(textCol), threshold).as("__label"))
    val m = LangId.train(labeled, "__text", "__label", n, vocabSize, alpha)
    require(m.langs.length == 2,
      s"weak labels collapsed to ${m.langs.mkString(",")} — the corpus is " +
        "entirely one class at this threshold; adjust threshold or corpus")
    m
  }

  /** Margin column round6(ll_hi) - round6(ll_lo) through the native
    * codegen'd expression (null text → null).
    */
  def marginCol(text: Column, model: LangId.LangIdModel): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.LangIdMargin(bridge.expression(text), model,
      model.labelIndex(HiLabel), model.labelIndex(LoLabel)))
  }

  /** Keep-decision column: margin >= minMargin (null text → null). */
  def keepCol(text: Column, model: LangId.LangIdModel, minMargin: Double = 0.0): Column =
    marginCol(text, model) >= minMargin

  /** Filtered frame: rows whose text the model keeps (nulls dropped). */
  def filter(df: DataFrame, textCol: String, model: LangId.LangIdModel,
             minMargin: Double = 0.0): DataFrame =
    df.filter(keepCol(col(textCol), model, minMargin))
}
