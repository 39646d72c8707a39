package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions._
import graft.profile.{ConfusionMatrixSummary, DatasetProfileView, ModelPerformanceSummary, RegressionSummary}

/** Model-performance aggregators (whylogs
  * `python/whylogs/core/model_performance_metrics/...`): confusion matrix for
  * classification, error sums for regression. Both are plain shuffles /
  * single-pass aggregations — dataset-level, merge-friendly.
  */
object ModelPerf {

  /** Confusion matrix: one row per (target, prediction) cell with count and
    * exact score sum (reference keeps a score distribution per cell,
    * `confusion_matrix.py:43-274`; the cell count + score stats come from
    * one groupBy — a single shuffle on the pair key). */
  def confusionMatrixDF(
      df: DataFrame, target: Column, prediction: Column,
      score: Option[Column] = None): DataFrame = {
    val base = df.groupBy(target.cast("string").as("target"),
      prediction.cast("string").as("prediction"))
    val aggs = Seq(F.count(F.lit(1)).as("n")) ++
      score.map(s => exact_sum(s).as("score_sum")).toSeq ++
      score.map(s => distribution_agg(s).as("score_distribution")).toSeq
    base.agg(aggs.head, aggs.tail: _*)
  }

  /** Regression metrics: count, MAE, MSE, RMSE via exact decimal error sums
    * (reference `regression_metrics.py:7-105` keeps Σ|e|, Σe, Σe²).
    * Error values are cast to decimal after double subtraction; exact and
    * partition-order independent (see DescriptiveStats note). */
  def regressionMetricsDF(df: DataFrame, target: Column, prediction: Column): DataFrame = {
    val err = prediction - target
    val absSum = F.sum(F.abs(err).cast("decimal(32,6)")).cast("double")
    val errSum = F.sum(err.cast("decimal(32,6)")).cast("double")
    // scale 4: coarse enough that the decimal grid is wider than double ulp
    // at 1e8 magnitude (so both engines round the same double identically),
    // fine enough to be exact for ≤2-decimal inputs (err² is an 8-decimal
    // ideal that provably never lands on a half-of-10⁻⁴ boundary).
    val sqSum = F.sum((err * err).cast("decimal(38,4)")).cast("double")
    val n = F.count(F.when(target.isNotNull && prediction.isNotNull, 1))
    df.agg(
      n.as("n"),
      absSum.as("abs_error_sum"),
      errSum.as("error_sum"),
      sqSum.as("sq_error_sum"),
      (absSum / n).as("mae"),
      (sqSum / n).as("mse"),
      F.sqrt(sqSum / n).as("rmse"))
  }

  // ---- collected summaries (the ModelPerformanceMetrics wrapper,
  // `model_performance_metrics.py`) ----

  /** Collected confusion matrix (labels ≤ 256 per the reference cap, so
    * the cell map is driver-safe). */
  def confusionMatrix(df: DataFrame, target: Column, prediction: Column,
      score: Option[Column] = None): ConfusionMatrixSummary = {
    val rows = confusionMatrixDF(df, target, prediction, score).collect()
    ConfusionMatrixSummary(rows.map { r =>
      val s = if (score.isDefined) r.getAs[Double]("score_sum") else 0.0
      (r.getAs[String]("target"), r.getAs[String]("prediction")) ->
        (r.getAs[Long]("n"), s)
    }.toMap)
  }

  /** Collected regression summary. */
  def regression(df: DataFrame, target: Column, prediction: Column): RegressionSummary = {
    val r = regressionMetricsDF(df, target, prediction).collect()(0)
    RegressionSummary(r.getAs[Long]("n"), r.getAs[Double]("abs_error_sum"),
      r.getAs[Double]("error_sum"), r.getAs[Double]("sq_error_sum"))
  }

  /** Attach model-performance metrics to a profile view (the reference's
    * `profile.track_metrics` path). */
  def attach(view: DatasetProfileView,
      confusion: Option[ConfusionMatrixSummary] = None,
      regression: Option[RegressionSummary] = None): DatasetProfileView = {
    val mp = ModelPerformanceSummary(confusion, regression)
    view.copy(modelPerformance = view.modelPerformance.map(_.merge(mp)).orElse(Some(mp)))
  }

  // ---- segmented model performance (the reference's
  // `api/logger/__init__.py:121-163` `_segmented_performance_metrics`) ----

  /** Per-segment confusion matrices in ONE shuffle:
    * groupBy(segments ++ (target, prediction)); each segment's summary is
    * a ≤256²-cell map, driver-safe regardless of row count. */
  def segmentedConfusionMatrix(
      df: DataFrame, segmentColumns: Seq[String],
      target: Column, prediction: Column,
      score: Option[Column] = None): Map[Seq[String], ConfusionMatrixSummary] = {
    val segCols = segmentColumns.map(c => F.col(c).cast("string").as(s"__seg_$c"))
    val keys = segCols ++ Seq(target.cast("string").as("target"),
      prediction.cast("string").as("prediction"))
    val aggs = Seq(F.count(F.lit(1)).as("n")) ++
      score.map(s => exact_sum(s).as("score_sum")).toSeq
    val rows = df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*).collect()
    rows.groupBy(r => segmentColumns.map(c => r.getAs[String](s"__seg_$c")).toSeq)
      .map { case (seg, cells) =>
        seg -> ConfusionMatrixSummary(cells.map { r =>
          val s = if (score.isDefined) r.getAs[Double]("score_sum") else 0.0
          (r.getAs[String]("target"), r.getAs[String]("prediction")) ->
            (r.getAs[Long]("n"), s)
        }.toMap)
      }
  }

  /** Per-segment regression summaries in ONE shuffle (exact decimal error
    * sums, same grid as [[regressionMetricsDF]]). */
  def segmentedRegression(
      df: DataFrame, segmentColumns: Seq[String],
      target: Column, prediction: Column): Map[Seq[String], RegressionSummary] = {
    val err = prediction - target
    val segCols = segmentColumns.map(c => F.col(c).cast("string").as(s"__seg_$c"))
    val rows = df.groupBy(segCols: _*).agg(
      F.count(F.when(target.isNotNull && prediction.isNotNull, 1)).as("n"),
      F.sum(F.abs(err).cast("decimal(32,6)")).cast("double").as("abs_error_sum"),
      F.sum(err.cast("decimal(32,6)")).cast("double").as("error_sum"),
      F.sum((err * err).cast("decimal(38,4)")).cast("double").as("sq_error_sum"))
      .collect()
    rows.map { r =>
      segmentColumns.map(c => r.getAs[String](s"__seg_$c")).toSeq ->
        RegressionSummary(r.getAs[Long]("n"), r.getAs[Double]("abs_error_sum"),
          r.getAs[Double]("error_sum"), r.getAs[Double]("sq_error_sum"))
    }.toMap
  }

  /** Calibration / reliability bins for a classifier score: equal-width
    * bins over `[lo, hi]` (scores outside clamp into the edge bins),
    * one row per NON-EMPTY bin —
    * `(bin, bin_lo, bin_hi, n, n_pos, frac_pos)` — the table a
    * reliability diagram plots and the drift monitors compare release
    * to release. Counts are exact BIGINTs; bounds and frac_pos are
    * single IEEE expressions of exact inputs, so (for a reproducible
    * score column, e.g. the dyadic-weight
    * [[graft.pipeline.QualityClassifier.logitOf]]) the whole table is
    * oracle-reproducible bit-for-bit.
    *
    * Scale: one map-side-combined groupBy over ≤ `bins` keys — the
    * cheapest possible shuffle; no window, no join. (Reference analog:
    * whylogs model-performance profiles score DISTRIBUTIONS
    * (`model_performance_metrics.py`); this is the calibration view of
    * the same inputs.) */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      bins: Int = 10, lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val width = hi - lo
    val bin = F.when(score <= F.lit(lo), F.lit(0L))
      .when(score >= F.lit(hi), F.lit((bins - 1).toLong))
      .otherwise(F.least(
        F.floor(((score - F.lit(lo)) / F.lit(width)) * F.lit(bins.toDouble)),
        F.lit((bins - 1).toLong)))
    df.select(bin.as("bin"), label.cast("long").as("__y"))
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("n"), F.sum("__y").as("n_pos"))
      .select(F.col("bin"),
        (F.lit(lo) + (F.col("bin").cast("double") * F.lit(width)) /
          F.lit(bins.toDouble)).as("bin_lo"),
        (F.lit(lo) + ((F.col("bin") + F.lit(1L)).cast("double") * F.lit(width)) /
          F.lit(bins.toDouble)).as("bin_hi"),
        F.col("n"), F.col("n_pos"),
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).as("frac_pos"))
  }
  /** EXACT chance-corrected agreement — Cohen's κ and the multiclass
    * Matthews correlation (Gorodkin's R_K), both kept as integer
    * fractions off ONE confusion-matrix exchange: with row totals t_k,
    * column totals p_k, agreement diag = Σ C_kk,
    * `num = n·diag − Σ t_k·p_k` is the shared numerator;
    * `κ = num / (n² − Σ t_k·p_k)` and
    * `MCC = num / (√(n² − Σ p_k²) · √(n² − Σ t_k²))` — each one fixed
    * IEEE tree over exact BIGINTs (driver math is
    * multiplyExact/addExact: past n² ≈ 2⁶³ — n ~ 3e9 rows — the
    * contract fails LOUDLY). Accuracy alone inflates under class
    * imbalance; these are the standard corrections. NULL when a
    * denominator is zero (single predicted or actual class). Output
    * one row `(n, n_agree, num, kappa, mcc)`.
    *
    * Scale: one map-side-combined groupBy(label, pred) — classes²
    * rows — collected driver-side, like [[TreeSplit]] histograms. */
  def agreementMetrics(df: DataFrame, labelCol: Column,
      predCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df.select(labelCol.cast("string").as("__l"),
        predCol.cast("string").as("__p"))
      .filter(F.col("__l").isNotNull && F.col("__p").isNotNull)
      .groupBy("__l", "__p").agg(F.count(F.lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.nonEmpty, "empty confusion matrix")
    def sumEx(xs: Iterable[Long]): Long = xs.foldLeft(0L)(Math.addExact)
    val n = sumEx(cells.map(_._3))
    val diag = sumEx(cells.collect { case (l, p, c) if l == p => c })
    val t = cells.groupBy(_._1).view.mapValues(rs => sumEx(rs.map(_._3))).toMap
    val p = cells.groupBy(_._2).view.mapValues(rs => sumEx(rs.map(_._3))).toMap
    val classes = (t.keySet ++ p.keySet).toSeq.sorted
    val sumTP = classes.foldLeft(0L)((a, k) => Math.addExact(a,
      Math.multiplyExact(t.getOrElse(k, 0L), p.getOrElse(k, 0L))))
    val sumTT = classes.foldLeft(0L)((a, k) => Math.addExact(a,
      Math.multiplyExact(t.getOrElse(k, 0L), t.getOrElse(k, 0L))))
    val sumPP = classes.foldLeft(0L)((a, k) => Math.addExact(a,
      Math.multiplyExact(p.getOrElse(k, 0L), p.getOrElse(k, 0L))))
    val n2 = Math.multiplyExact(n, n)
    val num = Math.subtractExact(Math.multiplyExact(n, diag), sumTP)
    val denK = Math.subtractExact(n2, sumTP)
    val denM = math.sqrt(Math.subtractExact(n2, sumPP).toDouble) *
      math.sqrt(Math.subtractExact(n2, sumTT).toDouble)
    val kappa = if (denK == 0L) None else Some(num.toDouble / denK.toDouble)
    val mcc = if (denM == 0.0) None else Some(num.toDouble / denM)
    Seq((n, diag, num, kappa, mcc))
      .toDF("n", "n_agree", "num", "kappa", "mcc")
  }
}

/** Accuracy estimation for unlabeled targets (reference
  * `experimental/performance_estimation/estimators.py:28-150`): the
  * reference segments' binary-classification accuracies, weighted by the
  * target's segment proportions. Driver-side math over collected
  * KB-scale summaries. */
object AccuracyEstimator {

  final case class SegmentEstimate(
      segment: String, targetCount: Long, refCorrect: Long, refTotal: Long,
      refAccuracy: Double, contribution: Double)

  final case class Result(estimatedAccuracy: Double, segments: Seq[SegmentEstimate])

  /** `reference`: segment → binary confusion matrix (labels `positive` /
    * `negative`); `targetCounts`: segment → row count in the unlabeled
    * target. Target keys must be a subset of reference keys. */
  def estimate(
      reference: Map[String, ConfusionMatrixSummary],
      targetCounts: Map[String, Long],
      positive: String = "1",
      negative: String = "0"): Result = {
    require(targetCounts.keySet.subsetOf(reference.keySet),
      "target segment keys must be a subset of the reference's")
    val totalTarget = targetCounts.values.sum.toDouble
    val segments = targetCounts.toSeq.sortBy(_._1).map { case (seg, cnt) =>
      val cm = reference(seg)
      val correct = cm.count(positive, positive) + cm.count(negative, negative)
      val total = correct + cm.count(positive, negative) + cm.count(negative, positive)
      val acc = if (total > 0) correct.toDouble / total else 0.0
      val weight = if (totalTarget > 0) cnt / totalTarget else 0.0
      SegmentEstimate(seg, cnt, correct, total, acc, weight * acc)
    }
    Result(segments.map(_.contribution).sum, segments)
  }

}
