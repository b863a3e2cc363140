package graft.select

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Standalone feature-selection estimator shell (reference
  * featsel.py:289-394 `FeatureSelector`): the fit/transform object around
  * [[FeatSel.selectFeatures]] for users who want multi-run noise-filtered
  * selection without the full AutoFeat synthesis pipeline.
  *
  * Spark shape of the sklearn API: `fit(df, targetCol)` treats every
  * non-target column as a feature (the reference's X columns) and records
  * their order; `Model.transform` demands EXACTLY the fitted column list
  * (featsel.py:374-375) and projects to the selected features — a pure
  * codegen'd column prune, shuffle-free at any scale.
  */
object FeatureSelector {

  final case class Config(
      problemType: String = "regression",
      featselRuns: Int = 5,
      keep: Seq[String] = Nil,
      nJobs: Int = 1,
      seed: Long = 0L
  )

  final case class Model(originalColumns: Seq[String], goodCols: Seq[String]) {
    private def q(c: String) = col(s"`${c.replace("`", "``")}`")

    /** Project to the selected features. The frame's feature columns (the
      * target, if present, is ignored so fit-input frames round-trip) must
      * equal the fitted list exactly — same names, same order
      * (featsel.py:372-375). An empty selection returns the frame
      * unchanged (featsel.py:357-360).
      */
    def transform(df: DataFrame, targetCol: Option[String] = None): DataFrame = {
      val inCols = df.columns.toSeq.filterNot(targetCol.contains)
      require(inCols == originalColumns,
        s"[FeatureSelector] Not the same features as when calling fit: $inCols vs $originalColumns")
      if (goodCols.isEmpty) df else df.select(goodCols.map(q): _*)
    }
  }

  /** Select features over every non-target column of `df`. */
  def fit(df: DataFrame, targetCol: String, cfg: Config = Config()): Model = {
    val featureCols = df.columns.toSeq.filterNot(_ == targetCol)
    require(featureCols.nonEmpty, "[FeatureSelector] no feature columns")
    val good = FeatSel.selectFeatures(df, featureCols, targetCol,
      FeatSel.Config(featselRuns = cfg.featselRuns, keep = cfg.keep,
        problemType = cfg.problemType, nJobs = cfg.nJobs, seed = cfg.seed))
    Model(featureCols, good)
  }

  def fitTransform(df: DataFrame, targetCol: String, cfg: Config = Config()): (DataFrame, Model) = {
    val m = fit(df, targetCol, cfg)
    (m.transform(df, Some(targetCol)), m)
  }
}
