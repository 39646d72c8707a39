package graft.analysis

import graft.profile.{DatasetProfileView, DistributionSummary, FrequentItemsSummary}

/** Profile-vs-profile drift scoring (whylogs
  * `python/whylogs/viz/drift/column_drift_algorithms.py:95-515`): KS for
  * numeric columns, χ² for categoricals, Hellinger over common histogram
  * bins. All computation happens driver-side over two collected KB-scale
  * profiles — the 100 TB inputs are never rescanned.
  */
object Drift {

  sealed trait Category
  case object NoDrift extends Category
  case object PossibleDrift extends Category
  case object DriftDetected extends Category

  final case class DriftScore(column: String, algorithm: String,
      statistic: Double, pValue: Option[Double], category: Category)

  /** Two-sample KS from the two KLL sketches: D = max |cdf_t − cdf_r| over
    * the union of both quantile grids (reference core loop
    * `column_drift_algorithms.py:339-363`); asymptotic p-value via the
    * Kolmogorov distribution with Stephens' small-sample correction.
    *
    * DOCUMENTED DIVERGENCE: the reference computes p with scipy's
    * `kstwo.sf(D, round(en))` (the exact one-sample distribution applied
    * to the effective n); we use the classical asymptotic two-sample
    * formula Q((√en + 0.12 + 0.11/√en)·D). The two agree to ~1e-3 for
    * en ≳ 50 and produce identical DRIFT/NO_DRIFT categorisation on the
    * reference's thresholds except within a hair of p = 0.05/0.15. */
  def ks(target: DistributionSummary, ref: DistributionSummary, gridSize: Int = 100): (Double, Double) = {
    if (target.n == 0 || ref.n == 0) return (0.0, 1.0)
    val ranks = (0 to gridSize).map(_.toDouble / gridSize).toArray
    val skT = target.sketch; val skR = ref.sketch
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    val grid = (skT.getQuantiles(ranks, INCLUSIVE) ++ skR.getQuantiles(ranks, INCLUSIVE))
      .distinct.sorted
    if (grid.isEmpty) return (0.0, 1.0)
    val cdfT = skT.getCDF(grid, INCLUSIVE)
    val cdfR = skR.getCDF(grid, INCLUSIVE)
    var d = 0.0
    var i = 0
    while (i < cdfT.length) { d = math.max(d, math.abs(cdfT(i) - cdfR(i))); i += 1 }
    val en = math.sqrt(target.n.toDouble * ref.n / (target.n.toDouble + ref.n))
    val p = kolmogorovSf((en + 0.12 + 0.11 / en) * d)
    (d, p)
  }

  /** χ² over the union of frequent-item sets: expected counts from the
    * reference proportions scaled to the target total
    * (reference `viz/utils/frequent_items_calculations.py:63-90`). */
  def chiSquare(target: FrequentItemsSummary, ref: FrequentItemsSummary): (Double, Double) =
    chiSquareCounts(
      target.items.map(i => i.value -> i.estimate).toMap,
      ref.items.map(i => i.value -> i.estimate).toMap)

  /** Counts-based χ² core — shared by the sketch path above and
    * [[DriftExact]]'s exact-counts path. */
  def chiSquareCounts(
      tCounts: Map[String, Long], rCounts: Map[String, Long]): (Double, Double) = {
    val tTotal = tCounts.values.sum.toDouble
    val rTotal = rCounts.values.sum.toDouble
    if (tTotal == 0 || rTotal == 0) return (0.0, 1.0)
    val keys = (tCounts.keySet ++ rCounts.keySet).toSeq.sorted
    var stat = 0.0
    keys.foreach { k =>
      val o = tCounts.getOrElse(k, 0L).toDouble
      val e = rCounts.getOrElse(k, 0L) / rTotal * tTotal
      if (e > 0) stat += (o - e) * (o - e) / e
    }
    val dof = keys.size - 1
    val p = if (dof <= 0) 1.0 else chi2Sf(stat, dof)
    (stat, p)
  }

  /** Hellinger distance over a common equal-width bin grid built from the
    * combined min/max (reference `column_drift_algorithms.py:95-204`,
    * bins from `viz/utils/quantile_stats.py:50-99`). */
  def hellinger(target: DistributionSummary, ref: DistributionSummary, nBins: Int = 30): Double = {
    if (target.n == 0 || ref.n == 0) return 0.0
    val lo = math.min(target.min.getOrElse(0.0), ref.min.getOrElse(0.0))
    val hi = math.max(target.max.getOrElse(0.0), ref.max.getOrElse(0.0))
    if (!(hi > lo)) return 0.0
    val splits = (1 until nBins).map(i => lo + (hi - lo) * i / nBins).toArray
    val p = target.pmf(splits)
    val q = ref.pmf(splits)
    var acc = 0.0
    var i = 0
    while (i < p.length) {
      val d = math.sqrt(p(i)) - math.sqrt(q(i))
      acc += d * d
      i += 1
    }
    math.sqrt(acc / 2.0)
  }

  /** Jensen–Shannon divergence (nats, ≤ ln 2) over the same common
    * equal-width grid as [[hellinger]], from the two profiles' KLL
    * PMFs — the sketch-path counterpart of
    * [[graft.analysis.DriftExact.jsdStats]] (same grid construction:
    * combined min/max, nBins equal widths), symmetric and needing no
    * smoothing. */
  def jsd(target: DistributionSummary, ref: DistributionSummary, nBins: Int = 30): Double = {
    if (target.n == 0 || ref.n == 0) return 0.0
    val lo = math.min(target.min.getOrElse(0.0), ref.min.getOrElse(0.0))
    val hi = math.max(target.max.getOrElse(0.0), ref.max.getOrElse(0.0))
    if (!(hi > lo)) return 0.0
    val splits = (1 until nBins).map(i => lo + (hi - lo) * i / nBins).toArray
    val p = target.pmf(splits)
    val q = ref.pmf(splits)
    var acc = 0.0
    var i = 0
    while (i < p.length) {
      val m = (p(i) + q(i)) / 2
      if (p(i) > 0) acc += 0.5 * (p(i) * math.log(p(i) / m))
      if (q(i) > 0) acc += 0.5 * (q(i) * math.log(q(i) / m))
      i += 1
    }
    acc
  }

  /** Per-column orchestration: KS + Hellinger for numeric, χ² for
    * categorical (reference `_get_drift_category:54-79`, defaults
    * `:427-455`). `overrides` forces a specific algorithm per column
    * ("ks" | "hellinger" | "chi2"), mirroring the reference's per-column
    * drift config (`calculate_drift_scores(..., drift_map)`). */
  def scores(target: DatasetProfileView, ref: DatasetProfileView,
      overrides: Map[String, String] = Map.empty): Seq[DriftScore] = {
    val common = (target.columns.keySet & ref.columns.keySet).toSeq.sorted
    // fail loudly on overrides that could never apply (typo'd column, or
    // forcing an algorithm whose metric the column lacks) — a silent miss
    // means the column is silently unmonitored
    overrides.keys.find(!common.contains(_)).foreach { k =>
      throw new IllegalArgumentException(
        s"drift override for '$k': column not present in both profiles")
    }
    overrides.foreach { case (c, alg) =>
      val t = target.columns(c); val r = ref.columns(c)
      val ok = alg match {
        case "ks" | "hellinger" | "jsd" =>
          t.distribution.exists(_.n > 0) && r.distribution.exists(_.n > 0)
        case "chi2" => t.frequentItems.nonEmpty && r.frequentItems.nonEmpty
        case other  => throw new IllegalArgumentException(s"unknown drift algorithm $other")
      }
      if (!ok) throw new IllegalArgumentException(
        s"drift override '$alg' for '$c': required metric missing or empty")
    }
    common.flatMap { c =>
      val t = target.columns(c); val r = ref.columns(c)
      def ksScore = for (td <- t.distribution; rd <- r.distribution if td.n > 0 && rd.n > 0)
        yield { val (d, p) = ks(td, rd); DriftScore(c, "ks", d, Some(p), pValueCategory(p)) }
      def hellScore = for (td <- t.distribution; rd <- r.distribution if td.n > 0 && rd.n > 0)
        yield { val h = hellinger(td, rd); DriftScore(c, "hellinger", h, None, distanceCategory(h)) }
      // category thresholds are calibrated for [0,1] distances; JSD is
      // bounded by ln 2, so normalize before categorizing
      def jsdScore = for (td <- t.distribution; rd <- r.distribution if td.n > 0 && rd.n > 0)
        yield { val j = jsd(td, rd)
          DriftScore(c, "jsd", j, None, distanceCategory(j / math.log(2.0))) }
      def chi2Score = for (tf <- t.frequentItems; rf <- r.frequentItems)
        yield { val (stat, p) = chiSquare(tf, rf); DriftScore(c, "chi2", stat, Some(p), pValueCategory(p)) }
      overrides.get(c) match {
        case Some("ks")        => ksScore.toSeq
        case Some("hellinger") => hellScore.toSeq
        case Some("jsd")       => jsdScore.toSeq
        case Some("chi2")      => chi2Score.toSeq
        case Some(other) => throw new IllegalArgumentException(s"unknown drift algorithm $other")
        case None =>
          val numeric = (ksScore, hellScore) match {
            case (Some(k), Some(h)) => Some(Seq(k, h))
            case _                  => None
          }
          numeric.getOrElse(chi2Score.map(Seq(_)).getOrElse(Seq.empty))
      }
    }
  }

  private[analysis] def pValueCategory(p: Double): Category =
    if (p < 0.05) DriftDetected else if (p < 0.15) PossibleDrift else NoDrift
  private[analysis] def distanceCategory(d: Double): Category =
    if (d > 0.3) DriftDetected else if (d > 0.15) PossibleDrift else NoDrift

  // --- special functions (standard published formulas) ---

  /** Kolmogorov distribution survival function:
    * Q(λ) = 2 Σ_{j≥1} (−1)^{j−1} e^{−2 j² λ²}. */
  def kolmogorovSf(lambda: Double): Double = {
    if (lambda < 1e-10) return 1.0
    var sum = 0.0
    var sign = 1.0
    var j = 1
    while (j <= 100) {
      val term = sign * 2.0 * math.exp(-2.0 * j * j * lambda * lambda)
      sum += term
      if (math.abs(term) < 1e-12) j = 101 else { sign = -sign; j += 1 }
    }
    math.min(1.0, math.max(0.0, sum))
  }

  /** χ² survival function: Q(k/2, x/2) via regularized incomplete gamma. */
  def chi2Sf(x: Double, k: Int): Double =
    if (x <= 0) 1.0 else regularizedGammaQ(k / 2.0, x / 2.0)

  /** Regularized upper incomplete gamma Q(a,x): series for x < a+1,
    * Lentz continued fraction otherwise (standard numerical formulas). */
  def regularizedGammaQ(a: Double, x: Double): Double = {
    if (x < a + 1.0) 1.0 - gammaPSeries(a, x)
    else gammaQContinuedFraction(a, x)
  }

  private def gammaPSeries(a: Double, x: Double): Double = {
    if (x <= 0) return 0.0
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var i = 0
    while (i < 500) {
      ap += 1
      del *= x / ap
      sum += del
      if (math.abs(del) < math.abs(sum) * 1e-14) i = 500 else i += 1
    }
    sum * math.exp(-x + a * math.log(x) - logGamma(a))
  }

  private def gammaQContinuedFraction(a: Double, x: Double): Double = {
    val fpmin = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / fpmin
    var d = 1.0 / b
    var h = d
    var i = 1
    while (i <= 500) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-14) i = 501 else i += 1
    }
    math.exp(-x + a * math.log(x) - logGamma(a)) * h
  }

  /** Lanczos log-gamma. */
  def logGamma(xx: Double): Double = {
    val cof = Array(76.18009172947146, -86.50532032941677, 24.01409824083091,
      -1.231739572450155, 0.1208650973866179e-2, -0.5395239384953e-5)
    val x = xx
    var y = xx
    val tmp0 = x + 5.5
    val tmp = tmp0 - (x + 0.5) * math.log(tmp0)
    var ser = 1.000000000190015
    var j = 0
    while (j < 6) { y += 1; ser += cof(j) / y; j += 1 }
    -tmp + math.log(2.5066282746310005 * ser / x)
  }
}
