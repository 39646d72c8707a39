package graft

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.{KllDoublesSketch, KllFloatsSketch}
import org.scalatest.funsuite.AnyFunSuite

import graft.profile._

/** v0 whylogs profile migration (reference `migration/converters.py`). */
class MigrationV0Spec extends AnyFunSuite {

  private def column(): ColumnProfileView = {
    val kll = KllDoublesSketch.newHeapInstance(128)
    (1 to 50).foreach(i => kll.update(i.toDouble))
    val hll = new HllSketch(12)
    (1 to 50).foreach(i => hll.update(i.toLong))
    val fi = new ItemsSketch[String](128)
    Seq("a", "a", "b").foreach(fi.update)
    val mean = 25.5
    val m2 = (1 to 50).map(i => (i - mean) * (i - mean)).sum
    ColumnProfileView(
      counts = Some(CountsSummary(50, 3, 0, 0, 7)),
      types = Some(TypeCountsSummary(50, 0, 0, 0, 0, 0)),
      ints = Some(IntsSummary(Some(1L), Some(50L))),
      distribution = Some(DistributionSummary(50, mean, m2, Some(1.0), Some(50.0),
        Seq.empty, Seq.empty, kll.toByteArray)),
      cardinality = Some(CardinalitySummary(hll.getEstimate, hll.getLowerBound(1),
        hll.getUpperBound(1), hll.toCompactByteArray)),
      frequentItems = Some(FrequentItemsSummary(
        FrequentItemsSummary.topItems(fi, 32), fi.toByteArray(new ArrayOfStringsSerDe))))
  }

  test("v0 write -> read round-trips counts, types, ints, moments, sketches") {
    val view = DatasetProfileView(Map("c" -> column()),
      datasetTimestampMs = Some(1700000000000L), metadata = Map("k" -> "v"))
    val back = MigrationV0.fromV0Bytes(MigrationV0.toV0Bytes(view))
    val (o, g) = (view.columns("c"), back.columns("c"))
    assert(g.counts.contains(CountsSummary(50, 3, 0, 0, 7)))
    assert(g.types == o.types)
    assert(g.ints == o.ints)
    val (d0, d1) = (o.distribution.get, g.distribution.get)
    assert(d1.n == d0.n && d1.mean == d0.mean && d1.m2 == d0.m2)
    assert(d1.min == d0.min && d1.max == d0.max)
    assert(g.cardinality.get.estimate == o.cardinality.get.estimate)
    assert(g.frequentItems.get.items == o.frequentItems.get.items)
    assert(back.datasetTimestampMs.contains(1700000000000L))
    assert(back.metadata == Map("k" -> "v"))
  }

  test("v0 kll_floats histogram falls back to an approximate doubles rebuild") {
    val fs = KllFloatsSketch.newHeapInstance(128)
    (1 to 10000).foreach(i => fs.update(i.toFloat))
    val (ds, exact) = MigrationV0.histogramToDoubles(fs.toByteArray).get
    assert(!exact)
    // medians agree to the combined sketch error (~2% of the range)
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    assert(math.abs(ds.getQuantile(0.5, INCLUSIVE) - 5000.0) < 400.0)
  }

  test("empty-distribution column migrates with the v0 empty kll placeholder") {
    val view = DatasetProfileView(Map("s" -> ColumnProfileView(
      counts = Some(CountsSummary(5, 5, 0, 0, 0)),
      types = Some(TypeCountsSummary(0, 0, 0, 5, 0, 0)))))
    val back = MigrationV0.fromV0Bytes(MigrationV0.toV0Bytes(view))
    assert(back.columns("s").counts.get.n == 5)
    assert(back.columns("s").distribution.exists(_.kll.nonEmpty)) // empty k=128 image
    assert(back.columns("s").distribution.get.n == 0)
  }

  test("model performance migrates: regression exact, confusion (count, sum)") {
    val mp = ModelPerformanceSummary(
      confusion = Some(ConfusionMatrixSummary(Map(
        ("cat", "cat") -> (10L, 7.5), ("cat", "dog") -> (2L, 0.5),
        ("dog", "dog") -> (20L, 18.0)))),
      regression = Some(RegressionSummary(100, 12.5, -3.25, 7.75)))
    val view = DatasetProfileView(Map.empty, modelPerformance = Some(mp))
    val back = MigrationV0.fromV0Bytes(MigrationV0.toV0Bytes(view))
    assert(back.modelPerformance.get.regression.contains(RegressionSummary(100, 12.5, -3.25, 7.75)))
    val cm = back.modelPerformance.get.confusion.get
    assert(cm.cells(("cat", "cat"))._1 == 10L)
    assert(math.abs(cm.cells(("cat", "cat"))._2 - 7.5) < 1e-9)
    assert(cm.cells(("dog", "dog")) == ((20L, 18.0)))
    assert(!cm.cells.contains(("dog", "cat"))) // zero cells stay absent
  }

  test("MultiMetric submetrics uncompound into column.submetric pseudo-columns") {
    val bundle = ColumnProfileView(counts = Some(CountsSummary(9, 0, 0, 0, 0)))
    val view = DatasetProfileView(Map("txt" -> ColumnProfileView(
      counts = Some(CountsSummary(9, 0, 0, 0, 0)),
      subMetrics = Map("unicode_range" -> Map("digits" -> bundle)))))
    val back = MigrationV0.fromV0Bytes(MigrationV0.toV0Bytes(view))
    assert(back.columns.keySet == Set("txt", "txt.digits"))
    assert(back.columns("txt.digits").counts.get.n == 9)
  }
}
