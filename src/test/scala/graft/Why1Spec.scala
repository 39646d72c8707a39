package graft

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.KllDoublesSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.profile._

/** `WHY1` container serde: golden bytes hand-derived from the public
  * protobuf wire spec + the reference's write path
  * (`core/view/dataset_profile_view.py:264-460`), mirroring the
  * reference's own round-trip test
  * (`tests/core/view/test_dataset_profile_view.py`). */
class Why1Spec extends AnyFunSuite {

  private def str(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** The exact bytes the reference writer emits for a one-column profile
    * whose only metric is counts{n=3, null=1, nan=0, inf=0, true=0}:
    * magic, empty DatasetSegmentHeader, DatasetProfileHeader, then one
    * COLUMN chunk. Derived by hand from proto/src/whylogs_messages.proto
    * field numbers; entry order is sorted (graft's deterministic choice —
    * any conformant parser accepts either order). */
  private def goldenBytes: Array[Byte] = {
    val header =
      Array[Byte](0x0a, 0x00) ++ // properties: empty DatasetProperties
        Array[Byte](0x12, 0x08, 0x0a, 0x01) ++ str("a") ++ // column_offsets["a"]
        Array[Byte](0x12, 0x03, 0x0a, 0x01, 0x00) ++ //   ChunkOffsets{offsets=[0]}
        Array[Byte](0x20, 0x2b) ++ // length = 43
        Array[Byte](0x2a, 0x0c, 0x12, 0x0a) ++ str("counts/inf") ++ // idx 0
        Array[Byte](0x2a, 0x0c, 0x08, 0x01, 0x12, 0x08) ++ str("counts/n") ++ // idx 1
        Array[Byte](0x2a, 0x0e, 0x08, 0x02, 0x12, 0x0a) ++ str("counts/nan") ++ // idx 2
        Array[Byte](0x2a, 0x0f, 0x08, 0x03, 0x12, 0x0b) ++ str("counts/null") ++ // idx 3
        Array[Byte](0x2a, 0x0f, 0x08, 0x04, 0x12, 0x0b) ++ str("counts/true") // idx 4
    assert(header.length == 92)
    val chunk = Array[Byte](
      0x0a, 0x04, 0x12, 0x02, 0x10, 0x00, // idx 0 (inf)  = 0
      0x0a, 0x06, 0x08, 0x01, 0x12, 0x02, 0x10, 0x03, // idx 1 (n)    = 3
      0x0a, 0x06, 0x08, 0x02, 0x12, 0x02, 0x10, 0x00, // idx 2 (nan)  = 0
      0x0a, 0x06, 0x08, 0x03, 0x12, 0x02, 0x10, 0x01, // idx 3 (null) = 1
      0x0a, 0x06, 0x08, 0x04, 0x12, 0x02, 0x10, 0x00) // idx 4 (true) = 0
    val body = Array[Byte](0x04, 0x08, 0x02, 0x18, 0x26) ++ chunk // ChunkHeader + chunk
    assert(body.length == 43 && chunk.length == 38)
    str("WHY1") ++ Array[Byte](0x00) ++ Array[Byte](92.toByte) ++ header ++ body
  }

  private val countsOnlyView = DatasetProfileView(
    Map("a" -> ColumnProfileView(counts = Some(CountsSummary(3, 1, 0, 0, 0)))))

  test("golden bytes: writer emits the reference wire layout exactly") {
    assert(Why1.toBytes(countsOnlyView).toSeq == goldenBytes.toSeq)
  }

  test("golden bytes: reader decodes a hand-encoded reference file") {
    val view = Why1.fromBytes(goldenBytes)
    assert(view.columns.keySet == Set("a"))
    assert(view.columns("a").counts.contains(CountsSummary(3, 1, 0, 0, 0)))
    assert(view.columns("a").types.isEmpty && view.columns("a").distribution.isEmpty)
    assert(view.datasetTimestampMs.isEmpty && view.metadata.isEmpty)
  }

  private def fullColumn(): ColumnProfileView = {
    val kll = KllDoublesSketch.newHeapInstance(1024)
    (1 to 100).foreach(i => kll.update(i.toDouble))
    val hll = new HllSketch(12)
    (1 to 100).foreach(i => hll.update(i.toLong))
    val fi = new ItemsSketch[String](128)
    Seq("x", "x", "y", "z").foreach(fi.update)
    val mean = 50.5
    val m2 = (1 to 100).map(i => (i - mean) * (i - mean)).sum
    ColumnProfileView(
      counts = Some(CountsSummary(100, 2, 1, 0, 0)),
      types = Some(TypeCountsSummary(100, 0, 0, 0, 0, 0)),
      ints = Some(IntsSummary(Some(1L), Some(100L))),
      distribution = Some(DistributionSummary(100, mean, m2, Some(1.0), Some(100.0),
        Seq(0.5), Seq(kll.getQuantile(0.5)), kll.toByteArray)),
      cardinality = Some(CardinalitySummary(hll.getEstimate, hll.getLowerBound(1),
        hll.getUpperBound(1), hll.toCompactByteArray)),
      frequentItems = Some(FrequentItemsSummary(
        FrequentItemsSummary.topItems(fi, 32), fi.toByteArray(new ArrayOfStringsSerDe))))
  }

  test("full column round-trips through WHY1 (sketches bit-identical)") {
    val view = DatasetProfileView(Map("v" -> fullColumn()),
      datasetTimestampMs = Some(1700000000000L),
      metadata = Map("whylogs.tag.region" -> "emea", "source" -> "unit"))
    val back = Why1.fromBytes(Why1.toBytes(view))
    val (orig, got) = (view.columns("v"), back.columns("v"))
    assert(got.counts == orig.counts)
    assert(got.types == orig.types)
    assert(got.ints == orig.ints)
    val (d0, d1) = (orig.distribution.get, got.distribution.get)
    assert(d1.n == d0.n && d1.mean == d0.mean && d1.m2 == d0.m2)
    assert(d1.min == d0.min && d1.max == d0.max)
    assert(d1.kll.toSeq == d0.kll.toSeq)
    assert(got.cardinality.get.estimate == orig.cardinality.get.estimate)
    assert(got.cardinality.get.hll.toSeq == orig.cardinality.get.hll.toSeq)
    assert(got.frequentItems.get.items == orig.frequentItems.get.items)
    assert(back.datasetTimestampMs.contains(1700000000000L))
    assert(back.metadata == view.metadata) // tags + metadata recombine
  }

  test("empty ints map to the reference sentinels and back to None") {
    val view = DatasetProfileView(
      Map("i" -> ColumnProfileView(ints = Some(IntsSummary(None, None)))))
    val back = Why1.fromBytes(Why1.toBytes(view))
    assert(back.columns("i").ints.contains(IntsSummary(None, None)))
  }

  test("MultiMetric submetrics flatten to ns/sub:subns/component paths") {
    val bundle = ColumnProfileView(counts = Some(CountsSummary(7, 0, 0, 0, 0)))
    val view = DatasetProfileView(Map("s" -> ColumnProfileView(
      counts = Some(CountsSummary(7, 0, 0, 0, 0)),
      subMetrics = Map("unicode_range" -> Map("digits" -> bundle)))))
    val back = Why1.fromBytes(Why1.toBytes(view))
    val col = back.columns("s")
    assert(col.counts.contains(CountsSummary(7, 0, 0, 0, 0)))
    assert(col.subMetrics("unicode_range")("digits").counts
      .contains(CountsSummary(7, 0, 0, 0, 0)))
  }

  test("merge of two WHY1 round-tripped profiles matches direct merge") {
    val a = DatasetProfileView(Map("c" -> ColumnProfileView(
      counts = Some(CountsSummary(10, 1, 0, 0, 0)),
      ints = Some(IntsSummary(Some(5L), Some(50L))))))
    val b = DatasetProfileView(Map("c" -> ColumnProfileView(
      counts = Some(CountsSummary(20, 0, 2, 0, 0)),
      ints = Some(IntsSummary(Some(-3L), Some(40L))))))
    val merged = Why1.fromBytes(Why1.toBytes(a)).merge(Why1.fromBytes(Why1.toBytes(b)))
    assert(merged.columns("c").counts.contains(CountsSummary(30, 1, 2, 0, 0)))
    assert(merged.columns("c").ints.contains(IntsSummary(Some(-3L), Some(50L))))
  }

  test("segmented file round-trips tags and per-segment profiles") {
    val segA = Why1.SegmentProfile(Seq("region" -> "emea"),
      DatasetProfileView(Map("c" -> ColumnProfileView(
        counts = Some(CountsSummary(10, 0, 0, 0, 0))))))
    val segB = Why1.SegmentProfile(Seq("region" -> "apac"),
      DatasetProfileView(Map("c" -> ColumnProfileView(
        counts = Some(CountsSummary(4, 1, 0, 0, 0))))))
    val bytes = Why1.toSegmentedBytes(Seq(segA, segB))
    val back = Why1.readSegmentedBytes(bytes)
    assert(back.map(_.tags) == Seq(Seq("region" -> "emea"), Seq("region" -> "apac")))
    assert(back.map(_.view.columns("c").counts.get.n) == Seq(10L, 4L))
    // a plain reader (reference behavior) takes the first segment's profile
    assert(Why1.fromBytes(bytes).columns("c").counts.get.n == 10L)
  }

  test("segmented read of a plain file yields one untagged segment") {
    val back = Why1.readSegmentedBytes(Why1.toBytes(countsOnlyView))
    assert(back.size == 1 && back.head.tags.isEmpty)
    assert(back.head.view.columns("a").counts.get.n == 3L)
  }

  test("bad magic is rejected") {
    val bad = "GRFT?".getBytes("UTF-8") ++ Why1.toBytes(countsOnlyView).drop(4)
    intercept[IllegalArgumentException](Why1.fromBytes(bad.take(60)))
  }
}
