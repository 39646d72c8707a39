package graft.api

import org.apache.spark.sql.{Column, DataFrame}

import graft.core.{MetricConfig, ResolverSpec}
import graft.profile.DatasetProfileView

/** Top-level entry points mirroring the reference's `why.*` API surface
  * (`api/logger/__init__.py:42-157`): `log` → profile a DataFrame,
  * `logSegmented` → one profile per segment, `logMultiple` → several
  * datasets at once, plus read/write of profile binaries. Thin sugar
  * over [[Profiler]] / [[ProfileStore]] — each call is one Spark
  * aggregation job.
  */
object Graft {

  final case class ProfileResultSet(view: DatasetProfileView) {
    def merge(o: ProfileResultSet): ProfileResultSet = ProfileResultSet(view.merge(o.view))
  }

  final case class SegmentedResultSet(segments: Map[Seq[String], DatasetProfileView]) {
    /** Merge all segments into one dataset-level profile. */
    def merged: DatasetProfileView =
      segments.values.foldLeft(DatasetProfileView.empty)(_ merge _)
  }

  /** `why.log(df)`. */
  def log(df: DataFrame,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): ProfileResultSet =
    ProfileResultSet(new Profiler(config, resolver).profile(df))

  /** `why.log(multiple={...})` — profile several datasets, keyed results
    * (reference `api/logger/__init__.py:56-68`). */
  def logMultiple(dfs: Map[String, DataFrame],
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): Map[String, ProfileResultSet] =
    dfs.map { case (name, df) => name -> log(df, config, resolver) }

  /** Segmented logging (`segment_processing.py`): one profile per
    * stringified segment key, single shuffle. */
  def logSegmented(df: DataFrame, segmentColumns: Seq[String],
      filter: Option[Column] = None,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): SegmentedResultSet =
    SegmentedResultSet(
      new Profiler(config, resolver).profileSegmented(df, segmentColumns, filter))

  /** `why.log_classification_metrics` (reference
    * `api/logger/__init__.py`): confusion matrix over
    * (target, prediction[, score]), attached to a profile view — of the
    * full data when `logFullData`, else of just the metric columns. */
  def logClassificationMetrics(
      df: DataFrame, target: Column, prediction: Column,
      score: Option[Column] = None, logFullData: Boolean = false,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): ProfileResultSet = {
    val base =
      if (logFullData) new Profiler(config, resolver).profile(df)
      else DatasetProfileView.empty
    val cm = graft.analysis.ModelPerf.confusionMatrix(df, target, prediction, score)
    ProfileResultSet(graft.analysis.ModelPerf.attach(base, confusion = Some(cm)))
  }

  /** `why.log_regression_metrics`. */
  def logRegressionMetrics(
      df: DataFrame, target: Column, prediction: Column,
      logFullData: Boolean = false,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): ProfileResultSet = {
    val base =
      if (logFullData) new Profiler(config, resolver).profile(df)
      else DatasetProfileView.empty
    val rg = graft.analysis.ModelPerf.regression(df, target, prediction)
    ProfileResultSet(graft.analysis.ModelPerf.attach(base, regression = Some(rg)))
  }

  /** Segmented `why.log_classification_metrics`
    * (`api/logger/__init__.py:121-163` `_segmented_performance_metrics`):
    * one profile per segment, each with its own confusion matrix —
    * profiles from one shuffle, matrices from a second. */
  def logSegmentedClassificationMetrics(
      df: DataFrame, segmentColumns: Seq[String],
      target: Column, prediction: Column, score: Option[Column] = None,
      logFullData: Boolean = false,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): SegmentedResultSet = {
    val base: Map[Seq[String], DatasetProfileView] =
      if (logFullData)
        new Profiler(config, resolver).profileSegmented(df, segmentColumns)
      else Map.empty
    val cms = graft.analysis.ModelPerf.segmentedConfusionMatrix(
      df, segmentColumns, target, prediction, score)
    SegmentedResultSet(cms.map { case (seg, cm) =>
      seg -> graft.analysis.ModelPerf.attach(
        base.getOrElse(seg, DatasetProfileView.empty), confusion = Some(cm))
    })
  }

  /** Segmented `why.log_regression_metrics`. */
  def logSegmentedRegressionMetrics(
      df: DataFrame, segmentColumns: Seq[String],
      target: Column, prediction: Column,
      logFullData: Boolean = false,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): SegmentedResultSet = {
    val base: Map[Seq[String], DatasetProfileView] =
      if (logFullData)
        new Profiler(config, resolver).profileSegmented(df, segmentColumns)
      else Map.empty
    val rgs = graft.analysis.ModelPerf.segmentedRegression(
      df, segmentColumns, target, prediction)
    SegmentedResultSet(rgs.map { case (seg, rg) =>
      seg -> graft.analysis.ModelPerf.attach(
        base.getOrElse(seg, DatasetProfileView.empty), regression = Some(rg))
    })
  }

  /** `log_batch_ranking_metrics` (reference
    * `experimental/api/logger/__init__.py:158-374`): compute the
    * per-row ranking metrics ([[graft.analysis.Ranking]]) and profile
    * them — just the metric columns unless `logFullData`, matching the
    * reference's double-profiling guard (`:362-369`). */
  def logBatchRankingMetrics(
      df: DataFrame, predictionCol: Option[String] = None,
      targetCol: Option[String] = None, scoreCol: Option[String] = None,
      k: Option[Int] = None, logFullData: Boolean = false,
      clampK: Boolean = true,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): ProfileResultSet = {
    val m = graft.analysis.Ranking.logBatchRankingMetrics(
      df, predictionCol, targetCol, scoreCol, k, clampK)
    val out =
      if (logFullData) m
      else m.select(m.columns.filterNot(df.columns.contains)
        .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    log(out, config, resolver)
  }

  /** Segmented ranking metrics (reference `:356-369`: segment columns
    * ride along, every other input column is dropped from the result
    * unless `logFullData`). */
  def logSegmentedBatchRankingMetrics(
      df: DataFrame, segmentColumns: Seq[String],
      predictionCol: Option[String] = None,
      targetCol: Option[String] = None, scoreCol: Option[String] = None,
      k: Option[Int] = None, logFullData: Boolean = false,
      clampK: Boolean = true,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): SegmentedResultSet = {
    val m = graft.analysis.Ranking.logBatchRankingMetrics(
      df, predictionCol, targetCol, scoreCol, k, clampK)
    val out =
      if (logFullData) m
      else m.select((segmentColumns ++
        m.columns.filterNot(df.columns.contains))
        .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    logSegmented(out, segmentColumns, None, config, resolver)
  }

  /** `why.write` / `why.read` — local binary profile files. */
  def write(result: ProfileResultSet, path: String): Unit =
    graft.profile.ProfileSerde.writeTo(result.view, path)

  def read(path: String): ProfileResultSet =
    ProfileResultSet(graft.profile.ProfileSerde.readFrom(path))
}
