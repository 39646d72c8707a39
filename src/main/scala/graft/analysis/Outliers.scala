package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Tukey-fence outlier detection per column — the data-quality check the
  * reference expresses only indirectly (constraints on fixed bounds);
  * here the bounds come from the data's own quartiles, the standard
  * exploratory rule (Tukey 1977: flag outside [q1 − k·IQR, q3 + k·IQR],
  * k = 1.5).
  *
  * Scale shape: quartiles via the distributed [[ExactQuantiles]]
  * (bounded state, one scan), then ONE more scan counts all columns'
  * fence violations map-side into a single collected row. Fences are
  * computed driver-side from exact quartiles and embedded as literals —
  * deterministic, and every count is an exact integer. */
object Outliers {

  /** Per column: quartiles, fences, and outlier counts. Returns a
    * DataFrame (col_name, q1, q3, iqr, lo_fence, hi_fence, n, n_low,
    * n_high, n_outliers). Columns with no non-null values are omitted. */
  def iqrOutliers(
      df: DataFrame, valueCols: Seq[String], k: Double = 1.5): DataFrame = {
    require(valueCols.nonEmpty, "iqrOutliers needs at least one column")
    val qs = ExactQuantiles.quantiles(df, valueCols, Seq(0.25, 0.75))
    val present = valueCols.filter(c => qs(c).nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    if (present.isEmpty)
      return Seq.empty[(String, Double, Double, Double, Double, Double, Long, Long, Long, Long)]
        .toDF("col_name", "q1", "q3", "iqr", "lo_fence", "hi_fence",
          "n", "n_low", "n_high", "n_outliers")
    val fences = present.map { c =>
      val Seq(q1, q3) = qs(c)
      val iqr = q3 - q1
      c -> (q1, q3, iqr, q1 - k * iqr, q3 + k * iqr)
    }.toMap
    val aggs = present.flatMap { c =>
      val v = F.col(c).cast("double")
      val (_, _, _, lo, hi) = fences(c)
      Seq(
        F.count(v).as(s"__n_$c"),
        F.sum(F.when(v < lo, 1L).otherwise(0L)).as(s"__lo_$c"),
        F.sum(F.when(v > hi, 1L).otherwise(0L)).as(s"__hi_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    present.map { c =>
      val (q1, q3, iqr, lo, hi) = fences(c)
      val n = row.getAs[Long](s"__n_$c")
      val nLo = row.getAs[Long](s"__lo_$c")
      val nHi = row.getAs[Long](s"__hi_$c")
      (c, q1, q3, iqr, lo, hi, n, nLo, nHi, nLo + nHi)
    }.toDF("col_name", "q1", "q3", "iqr", "lo_fence", "hi_fence",
      "n", "n_low", "n_high", "n_outliers")
  }

  /** Robust (MAD-based) outlier detection per column: median and median
    * absolute deviation via two [[ExactQuantiles]] passes, fences at
    * median ± k·(scale·MAD) with the Gaussian consistency constant
    * scale = 1.4826 (Hampel 1974; the robust analog of ±k·σ), then one
    * counting scan. Returns (col_name, med, mad, lo_fence, hi_fence, n,
    * n_low, n_high, n_outliers). Columns with no non-null values are
    * omitted.
    *
    * Exactness: med/MAD are exact interpolated order statistics; fences
    * are the literal IEEE expression `med − k·(scale·mad)` mirrored in
    * the oracle; counts are integers. Scale shape identical to
    * [[iqrOutliers]] — bounded state, three scans total. */
  def madOutliers(
      df: DataFrame, valueCols: Seq[String], k: Double = 3.0,
      scale: Double = 1.4826): DataFrame = {
    require(valueCols.nonEmpty, "madOutliers needs at least one column")
    val med = ExactQuantiles.quantiles(df, valueCols, Seq(0.5))
    val present = valueCols.filter(c => med(c).nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    if (present.isEmpty)
      return Seq.empty[(String, Double, Double, Double, Double, Long, Long, Long, Long)]
        .toDF("col_name", "med", "mad", "lo_fence", "hi_fence",
          "n", "n_low", "n_high", "n_outliers")
    // second pass: median of |v − med| per column, one scan for all
    val devDf = df.select(present.map(c =>
      F.abs(F.col(c).cast("double") - med(c).head).as(s"__d_$c")): _*)
    val mad = ExactQuantiles.quantiles(devDf, present.map(c => s"__d_$c"), Seq(0.5))
    val fences = present.map { c =>
      val m = med(c).head
      val d = mad(s"__d_$c").head
      c -> (m, d, m - k * (scale * d), m + k * (scale * d))
    }.toMap
    val aggs = present.flatMap { c =>
      val v = F.col(c).cast("double")
      val (_, _, lo, hi) = fences(c)
      Seq(
        F.count(v).as(s"__n_$c"),
        F.sum(F.when(v < lo, 1L).otherwise(0L)).as(s"__lo_$c"),
        F.sum(F.when(v > hi, 1L).otherwise(0L)).as(s"__hi_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    present.map { c =>
      val (m, d, lo, hi) = fences(c)
      val n = row.getAs[Long](s"__n_$c")
      val nLo = row.getAs[Long](s"__lo_$c")
      val nHi = row.getAs[Long](s"__hi_$c")
      (c, m, d, lo, hi, n, nLo, nHi, nLo + nHi)
    }.toDF("col_name", "med", "mad", "lo_fence", "hi_fence",
      "n", "n_low", "n_high", "n_outliers")
  }

  /** Winsorization summary — the robust alternative to DROPPING
    * outliers ([[iqrOutliers]]/[[madOutliers]] flag; this clips): clamp
    * everything outside the exact [loRank, hiRank] order-statistic
    * window to the window edge and report what moved. Returns ONE row
    * `(n, lo_cut, hi_cut, n_clipped_lo, n_clipped_hi, sum_raw,
    * sum_wins)` — cut points are the distributed exact type-7
    * quantiles ([[ExactQuantiles.quantiles]], embedded as literals),
    * clip counts are exact integers, and both sums accumulate as
    * DECIMAL(33,6) (fold-order-free) before ONE cast to double — so
    * the whole report replays in SQL bit-for-bit. NULL/NaN rows are
    * excluded.
    *
    * Scale shape: the quantile machinery's one scan + one range
    * exchange for the cut points, then ONE more map-side-combined
    * aggregate scan; the clip itself is a literal CASE any caller can
    * reuse as a map-only column. */
  def winsorize(df: DataFrame, valueCol: String,
      loRank: Double = 0.01, hiRank: Double = 0.99): DataFrame = {
    require(loRank >= 0.0 && loRank < hiRank && hiRank <= 1.0,
      "need 0 <= loRank < hiRank <= 1")
    val base = df.select(F.col(valueCol).cast("double").as("__v"))
      .filter(F.col("__v").isNotNull && !F.isnan(F.col("__v")))
    val qs = ExactQuantiles.quantiles(base, Seq("__v"), Seq(loRank, hiRank))("__v")
    require(qs.nonEmpty, s"no non-null values in $valueCol")
    val (loCut, hiCut) = (qs(0), qs(1))
    val clipped = F.least(F.greatest(F.col("__v"), F.lit(loCut)), F.lit(hiCut))
    base.agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.when(F.col("__v") < loCut, 1L).otherwise(0L)).as("n_clipped_lo"),
        F.sum(F.when(F.col("__v") > hiCut, 1L).otherwise(0L)).as("n_clipped_hi"),
        F.sum(F.col("__v").cast("decimal(33,6)")).as("__sr"),
        F.sum(clipped.cast("decimal(33,6)")).as("__sw"))
      .select(F.col("n"), F.lit(loCut).as("lo_cut"), F.lit(hiCut).as("hi_cut"),
        F.col("n_clipped_lo"), F.col("n_clipped_hi"),
        F.col("__sr").cast("double").as("sum_raw"),
        F.col("__sw").cast("double").as("sum_wins"))
  }
}
