package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions._

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
}
