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
}
