package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.{Drift, Viz}
import graft.api.Profiler

/** Viz analytics layer (reference `viz/utils`): bin formula, exact
  * histogram regime, feature/overall stats, FI overlay, drift report. */
class VizSpec extends SparkSpec {
  import spark.implicits._

  test("calculateBins: bucket count clamps and width formula") {
    // n=100, avg 4 -> 25 buckets (< max 30)
    val (bins, end) = Viz.calculateBins(10.0, 0.0, 100, 4.0, 30)
    assert(bins.size == 26)
    assert(bins.head == 0.0)
    assert(end == 10.0 + 10.0 * 1e-7)
    assert(math.abs(bins.last - end) < 1e-12)
    // n huge -> capped at maxBuckets
    assert(Viz.calculateBins(1.0, 0.0, 1000000, 4.0, 30)._1.size == 31)
    // n tiny -> floor at minNBuckets
    assert(Viz.calculateBins(1.0, 0.0, 3, 4.0, 30)._1.size == 3)
  }

  test("calculateBins: float32-precision resize widens bins at large magnitude") {
    // range 1e-5 at magnitude 1e9: min_interval = 2^(floor(log2 1e9)-23) = 64
    // width << 64 -> resized to max(floor(range/64), 1) = 1 bucket
    val (bins, _) = Viz.calculateBins(1e9 + 1e-5, 1e9, 1000, 4.0, 30)
    assert(bins.size == 2, s"expected a single widened bucket, got ${bins.size - 1}")
  }

  test("histogram is exact when the sketch is exact (n <= k)") {
    // 1..100, KLL k=1024 retains everything: counts must be exactly 4/bucket
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val view = new Profiler().profile(df)
    val h = Viz.histogram(view.columns("v").distribution.get).get
    assert(h.n == 100 && h.min == 1.0 && h.max == 100.0)
    assert(h.counts.sum == 100, s"counts ${h.counts} must sum to n")
    assert(h.counts.size == 25)
    assert(h.counts.forall(_ == 4L), s"uniform data: 4 per bucket, got ${h.counts}")
  }

  test("histogram: single-value and single-row distributions get one degenerate bin") {
    val one = new Profiler().profile(Seq(5.0, 5.0, 5.0).toDF("v"))
    val h = Viz.histogram(one.columns("v").distribution.get).get
    assert(h.counts == Seq(3L) && h.bins.size == 2 && h.bins.head == 5.0)
  }

  test("featureStats: exact panel fields") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None).toDF("v")
    val st = Viz.featureStats(new Profiler().profile(df).columns("v"))
    assert(st.totalCount.contains(4L) && st.missing.contains(1L))
    assert(st.min.contains(1.0) && st.max.contains(4.0) && st.range.contains(3.0))
    val d = st.descriptive.get
    assert(d.mean == 2.5 && math.abs(d.sum.get - 10.0) < 1e-12)
    assert(math.abs(d.variance - 5.0 / 3) < 1e-12)
    assert(math.abs(d.coefficientOfVariation.get - d.stddev / 2.5) < 1e-15)
    // HLL LIST-mode estimate is coupon-corrected, not a perfect integer
    assert(st.distinctPct.exists(p => math.abs(p - 100.0) < 0.01))
    val q = st.quantiles.get
    assert(q.median >= 2.0 && q.median <= 3.0 && q.iqr == q.q3 - q.q1)
  }

  test("overallStats sums counts across columns") {
    val df = Seq((Some(1), Some("a")), (Some(2), None), (None, Some("c")))
      .toDF("x", "y")
    val o = Viz.overallStats(new Profiler().profile(df))
    assert(o.observations == 6 && o.missingCells == 2)
    assert(math.abs(o.missingPercentage - 100.0 / 3) < 1e-9)
  }

  test("frequentItemsOverlay zero-pads items absent on one side") {
    val t = new Profiler().profile(Seq("a", "a", "b").toDF("c")).columns("c")
    val r = new Profiler().profile(Seq("b", "c", "c").toDF("c")).columns("c")
    val overlay = Viz.frequentItemsOverlay(t.frequentItems.get, r.frequentItems.get)
    assert(overlay.map(_.value).sorted == Seq("a", "b", "c"))
    val byVal = overlay.map(o => o.value -> (o.targetEstimate, o.referenceEstimate)).toMap
    assert(byVal("a") == (2L, 0L) && byVal("b") == (1L, 1L) && byVal("c") == (0L, 2L))
  }

  test("summaryDriftReport: continuous columns get KS + histograms, discrete get chi2 + overlay") {
    val half1 = Seq((1.0, "x"), (2.0, "y"), (3.0, "x"), (4.0, "y")).toDF("num", "cat")
    val half2 = Seq((1.5, "x"), (2.5, "x"), (3.5, "x"), (9.0, "z")).toDF("num", "cat")
    val p = new Profiler()
    val report = Viz.summaryDriftReport(p.profile(half1), p.profile(half2))
    val byCol = report.map(r => r.column -> r).toMap
    val num = byCol("num")
    assert(num.isDiscrete.contains(false) && num.algorithm.contains("ks"))
    assert(num.histogram.nonEmpty && num.refHistogram.nonEmpty)
    assert(num.frequentItems.isEmpty)
    assert(num.primaryValue == num.pValue)
    val cat = byCol("cat")
    assert(cat.isDiscrete.contains(true) && cat.algorithm.contains("chi2"))
    assert(cat.histogram.isEmpty)
    assert(cat.frequentItems.map(_.value).sorted == Seq("x", "y", "z"))
    assert(cat.category.nonEmpty)
  }
}
