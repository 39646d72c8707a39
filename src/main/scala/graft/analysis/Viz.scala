package graft.analysis

import graft.profile.{ColumnProfileView, DatasetProfileView, DistributionSummary,
  FrequentItemsSummary}

/** Profile visualization calculations — the reference's viz analytics
  * layer (whylogs `viz/utils/profile_viz_calculations.py`,
  * `histogram_calculations.py`, `descriptive_stats.py`,
  * `quantile_stats.py`, `frequent_items_calculations.py`), minus the
  * HTML rendering: everything here is the data behind
  * `NotebookProfileVisualizer.profile_summary` /
  * `summary_drift_report`.
  *
  * All inputs are KB-scale collected profile views; every function is
  * driver-side arithmetic — visualizing 100 TB costs one profile pass.
  */
object Viz {

  /** HistogramConfig defaults (`viz/configs.py:6-8`). */
  val MaxHistBuckets = 30
  val HistAvgPerBucket = 4.0
  val MinNBuckets = 2
  /** float32 mantissa bits — the sketch the reference plots stores
    * float32, so bin edges closer than one ulp at that scale collapse
    * (`quantile_stats.py:15`). */
  val FloatMantissaBits = 23

  final case class HistogramSummary(
      start: Double, end: Double, counts: Seq[Long],
      max: Double, min: Double, bins: Seq[Double], n: Long)

  final case class QuantileStats(
      fifthPercentile: Double, q1: Double, median: Double, q3: Double,
      ninetyFifthPercentile: Double) {
    def iqr: Double = q3 - q1
  }

  final case class DescriptiveStats(
      stddev: Double, mean: Double, variance: Double,
      sum: Option[Double], coefficientOfVariation: Option[Double])

  final case class FeatureStats(
      totalCount: Option[Long], missing: Option[Long],
      distinctPct: Option[Double], min: Option[Double], max: Option[Double],
      range: Option[Double], quantiles: Option[QuantileStats],
      descriptive: Option[DescriptiveStats])

  final case class OverallStats(
      observations: Long, missingCells: Long, missingPercentage: Double)

  /** One zero-padded frequent-item overlay row
    * (`frequent_items_calculations.py:63-92`). */
  final case class FrequentItemOverlay(value: String, targetEstimate: Long,
      referenceEstimate: Long)

  /** Bin edges for a KLL histogram (`quantile_stats.py:76-99`
    * `_calculate_bins` + `_resize_bins`): ~n/avgPerBucket buckets capped
    * at maxBuckets, widened when the width underflows float32 precision
    * at the data's magnitude. Returns (bins, adjustedEnd). */
  def calculateBins(end0: Double, start: Double, n: Long, avgPerBucket: Double,
      maxBuckets: Int, minNBuckets: Int = MinNBuckets): (Seq[Double], Double) = {
    val end = end0 + (if (end0 != 0) math.abs(end0) * 1e-7 else 1e-7)
    var nBuckets = math.max(
      math.min(math.ceil(n / avgPerBucket).toLong, maxBuckets.toLong),
      minNBuckets.toLong).toInt
    var width = (end - start) / nBuckets
    val maxMagnitude = math.max(math.abs(start), math.abs(end))
    val minInterval = math.pow(2,
      math.floor(math.log(maxMagnitude) / math.log(2)) - FloatMantissaBits)
    if (width < minInterval) {
      nBuckets = math.max(math.floor((end - start) / minInterval).toLong, 1L).toInt
      width = (end - start) / nBuckets
    }
    val w = width
    ((0 to nBuckets).map(i => start + i * w), end)
  }

  /** Histogram of a distribution summary from its KLL PMF
    * (`histogram_calculations.py:41-96`): counts are `round(pmf · n)`
    * over the interior bins. Exact whenever the sketch is exact
    * (n ≤ k: every value retained). None for an empty distribution. */
  def histogram(d: DistributionSummary,
      maxBuckets: Int = MaxHistBuckets, avgPerBucket: Double = HistAvgPerBucket,
      minNBuckets: Int = MinNBuckets): Option[HistogramSummary] = {
    if (d.n == 0) return None
    for (start <- d.min; maxVal <- d.max) yield {
      if (d.n < 2 || start == maxVal) {
        val dx = math.abs(start) * 1e-7
        HistogramSummary(start, start + dx, Seq(d.n), maxVal, start,
          Seq(start, start + dx), d.n)
      } else {
        val (bins, end) = calculateBins(maxVal, start, d.n, avgPerBucket,
          maxBuckets, minNBuckets)
        // EXCLUSIVE: interval i is [s_{i-1}, s_i) — matching the
        // reference sketch's get_pmf, whose first interior bin contains
        // the min value (INCLUSIVE would push min-valued rows into the
        // dropped leading interval)
        val pmf = d.sketch.getPMF(bins.toArray,
          org.apache.datasketches.quantilescommon.QuantileSearchCriteria.EXCLUSIVE)
        val counts = pmf.slice(1, pmf.length - 1)
          .map(p => math.round(p * d.n)).toSeq
        HistogramSummary(start, end, counts, maxVal, start, bins, d.n)
      }
    }
  }

  /** Per-feature statistics panel (`profile_viz_calculations.py:57-106`):
    * counts, distinct %, min/max/range, quantile + descriptive stats. */
  def featureStats(cp: ColumnProfileView): FeatureStats = {
    val totalCount = cp.counts.map(c => c.n - c.nulls)
    val missing = cp.counts.map(_.nulls)
    val distinctPct = for {
      card <- cp.cardinality
      cnt <- cp.counts
      nonNull = cnt.n - cnt.nulls
      if nonNull != 0
    } yield card.estimate / nonNull * 100.0
    val dist = cp.distribution.filter(_.n > 0)
    val range = for (d <- dist; lo <- d.min; hi <- d.max) yield hi - lo
    val quantiles = dist.map { d =>
      val qs = d.sketch.getQuantiles(Array(0.05, 0.25, 0.5, 0.75, 0.95),
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
      QuantileStats(qs(0), qs(1), qs(2), qs(3), qs(4))
    }
    val descriptive = dist.map { d =>
      val sum = totalCount.map(_ * d.mean)
      val cov = if (d.mean != 0) Some(d.stddev / d.mean) else None
      DescriptiveStats(d.stddev, d.mean, d.variance, sum, cov)
    }
    FeatureStats(totalCount, missing, distinctPct,
      dist.flatMap(_.min), dist.flatMap(_.max), range, quantiles, descriptive)
  }

  /** Dataset-level panel (`profile_viz_calculations.py:328-346`). */
  def overallStats(view: DatasetProfileView): OverallStats = {
    var observations = 0L
    var missingCells = 0L
    view.columns.values.foreach(_.counts.foreach { c =>
      observations += c.n
      missingCells += c.nulls
    })
    val pct = if (observations != 0) missingCells.toDouble / observations * 100 else 0.0
    OverallStats(observations, missingCells, pct)
  }

  /** Zero-padded frequent-item overlay for a discrete column pair
    * (`frequent_items_calculations.py:63-92`): the union of both item
    * sets, absent items shown with estimate 0, ordered by descending
    * target estimate then value. */
  def frequentItemsOverlay(target: FrequentItemsSummary,
      ref: FrequentItemsSummary): Seq[FrequentItemOverlay] = {
    val t = target.items.map(i => i.value -> i.estimate).toMap
    val r = ref.items.map(i => i.value -> i.estimate).toMap
    (t.keySet ++ r.keySet).toSeq
      .map(v => FrequentItemOverlay(v, t.getOrElse(v, 0L), r.getOrElse(v, 0L)))
      .sortBy(o => (-o.targetEstimate, o.value))
  }

  /** One column of the summary drift report. `primaryValue` is the
    * p-value when the algorithm has one, else the statistic
    * (`profile_viz_calculations.py:159-213`). */
  final case class ColumnDriftSummary(
      column: String, isDiscrete: Option[Boolean],
      algorithm: Option[String], statistic: Option[Double],
      pValue: Option[Double], primaryValue: Option[Double],
      category: Option[String], stats: FeatureStats,
      histogram: Option[HistogramSummary],
      refHistogram: Option[HistogramSummary],
      frequentItems: Seq[FrequentItemOverlay])

  /** The data behind `summary_drift_report`
    * (`profile_viz_calculations.py:159-242`): for every column present
    * in BOTH profiles — target feature stats, the column's drift score
    * (the reference's default algorithm choice: KS for numeric, χ² for
    * categorical), and the comparison artwork (histogram pair for
    * continuous columns, zero-padded frequent-item overlay for
    * discrete). */
  def summaryDriftReport(target: DatasetProfileView, ref: DatasetProfileView,
      overrides: Map[String, String] = Map.empty): Seq[ColumnDriftSummary] = {
    val driftByCol = Drift.scores(target, ref, overrides)
      .groupBy(_.column)
      .map { case (c, ss) =>
        // reference default map runs ONE algorithm per column: KS when a
        // distribution exists, else chi2; hellinger only via override
        c -> ss.sortBy(s => s.algorithm match {
          case "ks" => 0; case "chi2" => 1; case _ => 2
        }).head
      }
    val common = (target.columns.keySet & ref.columns.keySet).toSeq.sorted
    common.map { c =>
      val t = target.columns(c)
      val r = ref.columns(c)
      val drift = driftByCol.get(c)
      val continuous = t.distribution.exists(_.n > 0) && r.distribution.exists(_.n > 0)
      val discrete = !continuous && t.frequentItems.nonEmpty && r.frequentItems.nonEmpty
      val isDiscrete =
        if (continuous) Some(false) else if (discrete) Some(true) else None
      ColumnDriftSummary(
        column = c,
        isDiscrete = isDiscrete,
        algorithm = drift.map(_.algorithm),
        statistic = drift.map(_.statistic),
        pValue = drift.flatMap(_.pValue),
        primaryValue = drift.map(d => d.pValue.getOrElse(d.statistic)),
        category = drift.map(_.category.toString),
        stats = featureStats(t),
        histogram = if (continuous) t.distribution.flatMap(histogram(_)) else None,
        refHistogram = if (continuous) r.distribution.flatMap(histogram(_)) else None,
        frequentItems =
          if (discrete)
            (for (tf <- t.frequentItems; rf <- r.frequentItems)
              yield frequentItemsOverlay(tf, rf)).getOrElse(Nil)
          else Nil)
    }
  }
}
