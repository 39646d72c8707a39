package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions.exact_sum

/** Categorical feature encodings for model training — the feature-prep
  * stage between the corpus operators and a trainer
  * ([[graft.pipeline.NaiveBayes]], [[Ols]],
  * [[graft.pipeline.QualityClassifier]]).
  *
  * (Reference analog: none — whylogs profiles features, it does not
  * build them; this exists for the pipelines those profiles monitor.)
  */
object FeatureEncoding {

  /** Smoothed TARGET (mean) encoding (Micci-Barreca, SIGKDD Expl. 2001):
    * each category's target mean shrunk toward the global prior —
    * `enc_c = (Σ_c target + m · prior) / (n_c + m)` with
    * `prior = Σ target / n`. The classic high-cardinality categorical
    * encoding; the smoothing keeps rare categories from memorizing
    * their few labels.
    *
    * Exactness: both sums accumulate as DECIMAL(32,6) (exact at
    * 6 fractional digits under any partitioning — the
    * [[ModelPerf.regressionMetricsDF]] regime), and the encoding is
    * one fixed scalar IEEE tree over them, so the table hash-matches a
    * SQL oracle. Output: `(category, n, enc)`, one row per category.
    *
    * Scale: ONE map-side-combined groupBy over categories plus a
    * broadcast of the 1-row global sums; no window, no second scan.
    * NULL categories encode like any other key (their row carries a
    * NULL category). */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Double = 10.0): DataFrame = {
    require(smoothing >= 0.0, s"smoothing must be >= 0, got $smoothing")
    val t = F.col(targetCol)
    val perCat = df.groupBy(F.col(catCol).as("category"))
      .agg(F.count(t).as("n"), exact_sum(t).as("__sum"))
    val global = df.agg(F.count(t).as("__gn"), exact_sum(t).as("__gsum"))
    val prior = F.col("__gsum") / F.col("__gn").cast("double")
    val enc = (F.col("__sum") + F.lit(smoothing) * prior) /
      (F.col("n").cast("double") + F.lit(smoothing))
    perCat.crossJoin(F.broadcast(global))
      .select(F.col("category"), F.col("n"), enc.as("enc"))
  }

  /** Robust (median/IQR) scaling `(v − median) / iqr` — the
    * outlier-insensitive standardization (sklearn's RobustScaler
    * default). A zero IQR (≥ half the mass on one value) scales to 0
    * rather than dividing by zero. */
  def robustScale(v: Column, median: Double, iqr: Double): Column =
    if (iqr == 0.0) F.lit(0.0)
    else (v.cast("double") - F.lit(median)) / F.lit(iqr)

  /** Fit-and-audit for [[robustScale]]: exact median/quartiles from
    * [[ExactQuantiles]] (one distributed order-statistics pass), then
    * ONE summary row `(median, iqr, n, scaled_min, scaled_max)` from a
    * second scan applying the scaling. Cut points are literals; with
    * integer-valued columns they are exact in binary64, so the audit
    * replays bit-for-bit through `quantile_cont`. */
  def robustScaleStats(df: DataFrame, valueCol: String): DataFrame = {
    val qs = ExactQuantiles.quantiles(df, Seq(valueCol), Seq(0.25, 0.5, 0.75))(valueCol)
    require(qs.nonEmpty, s"no non-null values in $valueCol")
    val (q1, med, q3) = (qs(0), qs(1), qs(2))
    val scaled = robustScale(F.col(valueCol), med, q3 - q1)
    df.filter(F.col(valueCol).isNotNull && !F.isnan(F.col(valueCol).cast("double")))
      .agg(F.count(F.lit(1)).as("n"),
        F.min(scaled).as("scaled_min"), F.max(scaled).as("scaled_max"))
      .select(F.lit(med).as("median"), F.lit(q3 - q1).as("iqr"),
        F.col("n"), F.col("scaled_min"), F.col("scaled_max"))
  }
}
