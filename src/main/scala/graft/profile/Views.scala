package graft.profile

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

/** Immutable per-metric summaries + the mergeable sketch state.
  * The view layer is the analog of the reference's
  * DatasetProfileView/ColumnProfileView
  * (whylogs `python/whylogs/core/view/dataset_profile_view.py:50-475`):
  * profiles form a commutative monoid under `merge`.
  */
final case class CountsSummary(n: Long, nulls: Long, nan: Long, inf: Long, trueCount: Long) {
  def merge(o: CountsSummary): CountsSummary =
    CountsSummary(n + o.n, nulls + o.nulls, nan + o.nan, inf + o.inf, trueCount + o.trueCount)
}

final case class TypeCountsSummary(
    integral: Long, fractional: Long, boolean: Long, string: Long,
    obj: Long, tensor: Long) {
  def merge(o: TypeCountsSummary): TypeCountsSummary = TypeCountsSummary(
    integral + o.integral, fractional + o.fractional, boolean + o.boolean,
    string + o.string, obj + o.obj, tensor + o.tensor)
}

final case class IntsSummary(min: Option[Long], max: Option[Long]) {
  def merge(o: IntsSummary): IntsSummary = IntsSummary(
    (min ++ o.min).reduceOption(_ min _), (max ++ o.max).reduceOption(_ max _))
}

final case class DistributionSummary(
    n: Long, mean: Double, m2: Double,
    min: Option[Double], max: Option[Double],
    quantileRanks: Seq[Double], quantiles: Seq[Double],
    kll: Array[Byte]) {

  def variance: Double = if (n > 1) m2 / (n - 1) else 0.0
  def stddev: Double = math.sqrt(variance)

  def sketch: KllDoublesSketch = KllDoublesSketch.heapify(Memory.wrap(kll))

  /** Chan parallel merge on (n, mean, m2) + KLL sketch union — same
    * algebra as the distribution aggregate's partial/final merge. */
  def merge(o: DistributionSummary): DistributionSummary = {
    if (o.n == 0) this
    else if (n == 0) o
    else {
      val total = n + o.n
      val delta = o.mean - mean
      val newMean = (n * mean + o.n * o.mean) / total
      val newM2 = m2 + o.m2 + delta * delta * n.toDouble * o.n.toDouble / total
      val merged = sketch
      merged.merge(o.sketch)
      val ranks = if (quantileRanks.nonEmpty) quantileRanks else o.quantileRanks
      val qs =
        if (merged.isEmpty || ranks.isEmpty) Seq.empty[Double]
        else merged.getQuantiles(ranks.toArray, QuantileSearchCriteria.INCLUSIVE).toSeq
      DistributionSummary(total, newMean, newM2,
        (min ++ o.min).reduceOption(_ min _), (max ++ o.max).reduceOption(_ max _),
        ranks, qs, merged.toByteArray)
    }
  }

  /** Histogram over [lo, hi] with `bins` equal-width buckets, from the KLL
    * PMF (used by Hellinger drift and viz; reference
    * `viz/utils/histogram_calculations.py:31-96`). */
  def pmf(splitPoints: Array[Double]): Array[Double] = {
    val sk = sketch
    if (sk.isEmpty) Array.fill(splitPoints.length + 1)(0.0)
    else sk.getPMF(splitPoints, QuantileSearchCriteria.INCLUSIVE)
  }

  def cdf(splitPoints: Array[Double]): Array[Double] = {
    val sk = sketch
    if (sk.isEmpty) Array.fill(splitPoints.length + 1)(0.0)
    else sk.getCDF(splitPoints, QuantileSearchCriteria.INCLUSIVE)
  }
}

final case class CardinalitySummary(estimate: Double, lower: Double, upper: Double, hll: Array[Byte]) {
  def merge(o: CardinalitySummary, numStdDev: Int = 1): CardinalitySummary = {
    val u = new Union(math.max(4, HllSketch.heapify(hll).getLgConfigK))
    u.update(HllSketch.heapify(hll))
    u.update(HllSketch.heapify(o.hll))
    val sk = u.getResult(TgtHllType.HLL_4)
    CardinalitySummary(sk.getEstimate, sk.getLowerBound(numStdDev), sk.getUpperBound(numStdDev),
      sk.toCompactByteArray)
  }
}

final case class FrequentItem(value: String, estimate: Long, lower: Long, upper: Long)

final case class FrequentItemsSummary(items: Seq[FrequentItem], sketch: Array[Byte], limit: Int = 32) {
  def itemsSketch: ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(sketch), new ArrayOfStringsSerDe)

  def merge(o: FrequentItemsSummary): FrequentItemsSummary = {
    val merged = itemsSketch.merge(o.itemsSketch)
    FrequentItemsSummary(FrequentItemsSummary.topItems(merged, limit),
      merged.toByteArray(new ArrayOfStringsSerDe), limit)
  }
}

object FrequentItemsSummary {
  def topItems(sk: ItemsSketch[String], limit: Int): Seq[FrequentItem] =
    sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(limit)
      .map(r => FrequentItem(r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .toSeq
}

final case class ColumnProfileView(
    counts: Option[CountsSummary] = None,
    types: Option[TypeCountsSummary] = None,
    ints: Option[IntsSummary] = None,
    distribution: Option[DistributionSummary] = None,
    cardinality: Option[CardinalitySummary] = None,
    frequentItems: Option[FrequentItemsSummary] = None,
    /** MultiMetric namespaces (reference `core/multimetric.py:42-184`):
      * namespace → submetric name → standard metric bundle. A bundle
      * reuses ColumnProfileView, so merge/summary/serde recurse. */
    subMetrics: Map[String, Map[String, ColumnProfileView]] = Map.empty) {

  def merge(o: ColumnProfileView): ColumnProfileView = ColumnProfileView(
    mergeOpt(counts, o.counts)(_ merge _),
    mergeOpt(types, o.types)(_ merge _),
    mergeOpt(ints, o.ints)(_ merge _),
    mergeOpt(distribution, o.distribution)(_ merge _),
    mergeOpt(cardinality, o.cardinality)(_ merge (_)),
    mergeOpt(frequentItems, o.frequentItems)(_ merge _),
    (subMetrics.keySet ++ o.subMetrics.keySet).map { ns =>
      val a = subMetrics.getOrElse(ns, Map.empty)
      val b = o.subMetrics.getOrElse(ns, Map.empty)
      ns -> (a.keySet ++ b.keySet).map { sub =>
        sub -> ((a.get(sub), b.get(sub)) match {
          case (Some(x), Some(y)) => x.merge(y)
          case (x, y)             => x.orElse(y).get
        })
      }.toMap
    }.toMap)

  private def mergeOpt[T](a: Option[T], b: Option[T])(f: (T, T) => T): Option[T] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(f(x, y))
      case _ => a.orElse(b)
    }

  /** Flat (metric, component) → value map, like the reference's
    * `to_summary_dict` (`view/column_profile_view.py:88-107`). */
  def summaryMap: Map[String, Any] = {
    val b = Map.newBuilder[String, Any]
    counts.foreach { c =>
      b += "counts/n" -> c.n += "counts/null" -> c.nulls += "counts/nan" -> c.nan
      b += "counts/inf" -> c.inf += "counts/true" -> c.trueCount
    }
    types.foreach { t =>
      b += "types/integral" -> t.integral += "types/fractional" -> t.fractional
      b += "types/boolean" -> t.boolean += "types/string" -> t.string
      b += "types/object" -> t.obj += "types/tensor" -> t.tensor
    }
    ints.foreach { i =>
      i.min.foreach(v => b += "ints/min" -> v); i.max.foreach(v => b += "ints/max" -> v)
    }
    distribution.foreach { d =>
      b += "distribution/n" -> d.n += "distribution/mean" -> d.mean
      b += "distribution/stddev" -> d.stddev += "distribution/variance" -> d.variance
      d.min.foreach(v => b += "distribution/min" -> v)
      d.max.foreach(v => b += "distribution/max" -> v)
      d.quantileRanks.zip(d.quantiles).foreach { case (r, q) =>
        b += s"distribution/q_$r" -> q
      }
    }
    cardinality.foreach { c =>
      b += "cardinality/est" -> c.estimate
      b += "cardinality/lower_1" -> c.lower += "cardinality/upper_1" -> c.upper
    }
    frequentItems.foreach { f =>
      f.items.zipWithIndex.foreach { case (it, i) =>
        b += s"frequent_items/$i/value" -> it.value
        b += s"frequent_items/$i/estimate" -> it.estimate
      }
    }
    subMetrics.foreach { case (ns, subs) =>
      subs.foreach { case (sub, bundle) =>
        bundle.summaryMap.foreach { case (k, v) => b += s"$ns/$sub/$k" -> v }
      }
    }
    b.result()
  }
}

/** Dataset-level confusion matrix: (target, prediction) → count + exact
  * decimal score sum (reference `confusion_matrix.py:43-274`). Additive
  * monoid. */
final case class ConfusionMatrixSummary(cells: Map[(String, String), (Long, Double)]) {
  def count(t: String, p: String): Long = cells.get((t, p)).map(_._1).getOrElse(0L)
  def merge(o: ConfusionMatrixSummary): ConfusionMatrixSummary =
    ConfusionMatrixSummary((cells.keySet ++ o.cells.keySet).map { k =>
      val (n1, s1) = cells.getOrElse(k, (0L, 0.0))
      val (n2, s2) = o.cells.getOrElse(k, (0L, 0.0))
      k -> (n1 + n2, s1 + s2)
    }.toMap)
}

/** Dataset-level regression error sums (reference
  * `regression_metrics.py:7-105`). Additive monoid; MAE/MSE/RMSE derived. */
final case class RegressionSummary(n: Long, absErrorSum: Double, errorSum: Double, sqErrorSum: Double) {
  def mae: Double = if (n > 0) absErrorSum / n else 0.0
  def mse: Double = if (n > 0) sqErrorSum / n else 0.0
  def rmse: Double = math.sqrt(mse)
  def merge(o: RegressionSummary): RegressionSummary =
    RegressionSummary(n + o.n, absErrorSum + o.absErrorSum,
      errorSum + o.errorSum, sqErrorSum + o.sqErrorSum)
}

/** The reference's ModelPerformanceMetrics wrapper
  * (`core/model_performance_metrics/model_performance_metrics.py`). */
final case class ModelPerformanceSummary(
    confusion: Option[ConfusionMatrixSummary] = None,
    regression: Option[RegressionSummary] = None) {
  def merge(o: ModelPerformanceSummary): ModelPerformanceSummary =
    ModelPerformanceSummary(
      (confusion, o.confusion) match {
        case (Some(a), Some(b)) => Some(a.merge(b))
        case (a, b)             => a.orElse(b)
      },
      (regression, o.regression) match {
        case (Some(a), Some(b)) => Some(a.merge(b))
        case (a, b)             => a.orElse(b)
      })
}

final case class DatasetProfileView(
    columns: Map[String, ColumnProfileView],
    datasetTimestampMs: Option[Long] = None,
    metadata: Map[String, String] = Map.empty,
    modelPerformance: Option[ModelPerformanceSummary] = None,
    featureWeights: Option[FeatureWeights] = None) {

  /** Column-name union, per-metric monoid merge
    * (reference `view/dataset_profile_view.py:172-183`). */
  def merge(o: DatasetProfileView): DatasetProfileView = {
    val names = columns.keySet ++ o.columns.keySet
    DatasetProfileView(
      names.map { n =>
        n -> ((columns.get(n), o.columns.get(n)) match {
          case (Some(a), Some(b)) => a.merge(b)
          case (a, b)             => a.orElse(b).get
        })
      }.toMap,
      (datasetTimestampMs ++ o.datasetTimestampMs).reduceOption(_ min _),
      metadata ++ o.metadata,
      (modelPerformance, o.modelPerformance) match {
        case (Some(a), Some(b)) => Some(a.merge(b))
        case (a, b)             => a.orElse(b)
      },
      // the reference defines no weight-merge semantics (weights are an
      // externally-supplied annotation, not an aggregate) — keep the
      // left operand's, falling back to the right's
      featureWeights.orElse(o.featureWeights))
  }

  def summaryRows: Seq[(String, String, Option[Double], Option[String])] =
    columns.toSeq.sortBy(_._1).flatMap { case (col, view) =>
      view.summaryMap.toSeq.sortBy(_._1).map { case (k, v) =>
        v match {
          case d: Double => (col, k, Some(d), None)
          case l: Long   => (col, k, Some(l.toDouble), None)
          case i: Int    => (col, k, Some(i.toDouble), None)
          case s: String => (col, k, None, Some(s))
          case other     => (col, k, None, Some(String.valueOf(other)))
        }
      }
    }
}

object DatasetProfileView {
  val empty: DatasetProfileView = DatasetProfileView(Map.empty)
}
