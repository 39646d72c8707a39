package graft.profile

import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.profile.ProtoWire.Writer

/** Adversarial `WHY1` interop: hand-encoded files that CONFORM to the
  * public wire spec (`proto/src/whylogs_messages.proto:39-126`, reference
  * writer `core/view/dataset_profile_view.py:264-460`) but use layouts
  * graft's own writer never produces. [[graft.Why1Spec]] pins graft's
  * writer bytes; this spec pins the READER against the degrees of freedom
  * a conformant peer (the reference, or any proto implementation) may
  * exercise:
  *
  *  - physical chunk order differing from header (column-offset) order,
  *    with junk gap bytes between chunks — offsets are authoritative;
  *  - one column split across MULTIPLE chunks (repeated ChunkOffsets);
  *  - UNPACKED repeated offset varints (proto2-style) next to packed;
  *  - a sparse, non-contiguous, unsorted metric-path index;
  *  - unknown fields at every level (properties, header, chunk header,
  *    chunk entry, component) that must be skipped, including a `cpc`
  *    sketch (oneof member graft has no analog for → component dropped);
  *  - a negative int64 component (10-byte two's-complement varint);
  *  - the reference's single-segment offset quirk
  *    (`segmented_dataset_profile_view.py:193-205` stores the segment
  *    header's own size in the offset slot — sequential readers must not
  *    trust it).
  *
  * A golden file EMITTED BY the reference itself would close interop
  * beyond doubt, but is environment-blocked in this sandbox (verified
  * round 9): the vendored reference's writer cannot import without
  * `whylogs_sketching` (a compiled C++ datasketches binding) and
  * `protobuf`, neither installable offline (`pip install -e
  * /root/reference/python` fails on the poetry build backend; direct
  * `sys.path` import fails on both missing modules). The hand-derived
  * fixtures above are the conformant-peer substitute.
  */
class Why1GoldenSpec extends AnyFunSuite {

  // ---- component encoders (MetricComponentMessage, proto :39-56) ----

  private def intComp(typeId: Int, v: Long): Writer = {
    val w = new Writer
    w.varintField(1, typeId.toLong)
    w.tag(2, ProtoWire.WireVarint); w.varint(v)
    w
  }

  private def doubleComp(d: Double): Writer = new Writer().doubleField(3, d)

  private def sketchComp(field: Int, bytes: Array[Byte]): Writer =
    new Writer().msgField(field, new Writer().bytesField(1, bytes))

  /** ChunkMessage entry {index, component} with an unknown trailing field. */
  private def entry(idx: Int, comp: Writer, unknownTail: Boolean = false): Writer = {
    val e = new Writer().varintField(1, idx.toLong, emitZero = true).msgField(2, comp)
    if (unknownTail) { e.tag(3, ProtoWire.WireVarint); e.varint(99L) }
    e
  }

  /** Framed chunk: delimited ChunkHeader{type=COLUMN, length} + payload.
    * `unknownHdrField` plants a skippable field inside the ChunkHeader. */
  private def frame(entries: Seq[Writer], unknownHdrField: Boolean = false): Array[Byte] = {
    val chunk = new Writer
    entries.foreach(chunk.msgField(1, _))
    val hdr = new Writer().varintField(1, 2L).varintField(3, chunk.size.toLong)
    if (unknownHdrField) { hdr.tag(5, ProtoWire.WireVarint); hdr.varint(7L) }
    new Writer().delimited(hdr).raw(chunk.toBytes).toBytes
  }

  // ---- real sketch images (cross-language DataSketches formats) ----

  private val kllBytes: Array[Byte] = {
    val k = KllDoublesSketch.newHeapInstance(1024)
    Seq(1.0, 2.0, 3.0, 4.0).foreach(k.update)
    k.toByteArray
  }

  private val hllBytes: Array[Byte] = {
    val h = new HllSketch(12)
    Seq("x", "y", "z").foreach(h.update)
    h.toCompactByteArray
  }

  private val fiBytes: Array[Byte] = {
    val f = new ItemsSketch[String](128)
    Seq("a", "a", "b").foreach(f.update)
    f.toByteArray(new ArrayOfStringsSerDe)
  }

  /** Sparse, unsorted path index: the reader must resolve through the map,
    * never through positional order. Index 11 is declared but unused. */
  private val pathIndex: Seq[(Int, String)] = Seq(
    10 -> "counts/n",
    3 -> "counts/null",
    7 -> "ints/min",
    1 -> "ints/max",
    12 -> "distribution/kll",
    5 -> "distribution/mean",
    2 -> "distribution/m2",
    8 -> "cardinality/hll",
    4 -> "frequent_items/frequent_strings",
    9 -> "unicode_range/digits:counts/n",
    11 -> "counts/inf")

  /** The adversarial file. Header column order is sorted (alpha, zeta) but
    * the BODY stores zeta's chunk first; alpha is split across two chunks
    * separated by junk bytes the offsets skip over. */
  private def adversarialBytes: Array[Byte] = {
    // alpha chunk 1: counts + negative ints/min + an ignorable cpc component
    val alpha1 = frame(Seq(
      entry(10, intComp(0, 5L)),                    // counts/n = 5
      entry(3, intComp(0, 2L), unknownTail = true), // counts/null = 2
      entry(7, intComp(1, -5L)),                    // ints/min = -5 (10-byte varint)
      entry(8, sketchComp(7, hllBytes))             // cpc oneof → no analog, dropped
    ), unknownHdrField = true)
    // alpha chunk 2: ints/max + distribution + a MultiMetric submetric path
    val alpha2 = frame(Seq(
      entry(1, intComp(2, 9L)),        // ints/max = 9
      entry(12, sketchComp(6, kllBytes)),
      entry(5, doubleComp(2.5)),       // distribution/mean
      entry(2, doubleComp(5.0)),       // distribution/m2
      entry(9, intComp(0, 3L))))       // unicode_range/digits:counts/n = 3
    val zeta = frame(Seq(
      entry(10, intComp(0, 1L)),       // counts/n = 1
      entry(8, sketchComp(5, hllBytes)),
      entry(4, sketchComp(4, fiBytes))))

    val junk1 = Array[Byte](0x7f, 0x00, 0x33)
    val junk2 = Array[Byte](0x01, 0x02)
    val zetaOff = 0L
    val alpha1Off = (zeta.length + junk1.length).toLong
    val alpha2Off = alpha1Off + alpha1.length + junk2.length
    val body = zeta ++ junk1 ++ alpha1 ++ junk2 ++ alpha2

    // DatasetProperties with unknown fields 1 (schema version) and 3 (session id)
    val props = new Writer
    props.varintField(1, 2L)
    props.stringField(3, "sess-42")
    props.varintField(5, 1234567890123L)
    props.msgField(6, new Writer().stringField(1, "whylogs.tag.env").stringField(2, "prod"))
    props.msgField(7, new Writer().stringField(1, "pipeline").stringField(2, "adv"))

    val header = new Writer().msgField(1, props)
    // alpha: UNPACKED repeated offsets (two separate field-1 varints)
    val alphaOffs = new Writer
    alphaOffs.tag(1, ProtoWire.WireVarint); alphaOffs.varint(alpha1Off)
    alphaOffs.tag(1, ProtoWire.WireVarint); alphaOffs.varint(alpha2Off)
    header.msgField(2, new Writer().stringField(1, "alpha").msgField(2, alphaOffs))
    // zeta: packed offsets (proto3 default)
    header.msgField(2, new Writer().stringField(1, "zeta")
      .msgField(2, new Writer().packedVarints(1, Seq(zetaOff))))
    header.varintField(4, body.length.toLong)
    // unknown header fields the reader must skip
    header.tag(9, ProtoWire.WireVarint); header.varint(123L)
    header.msgField(8, new Writer().stringField(1, "future"))
    pathIndex.foreach { case (idx, p) =>
      header.msgField(5, new Writer().varintField(1, idx.toLong).stringField(2, p))
    }

    new Writer()
      .raw("WHY1".getBytes("UTF-8"))
      .delimited(new Writer) // empty DatasetSegmentHeader
      .delimited(header)
      .raw(body)
      .toBytes
  }

  test("adversarial multi-column multi-chunk file decodes correctly") {
    val view = Why1.fromBytes(adversarialBytes)
    assert(view.columns.keySet == Set("alpha", "zeta"))
    assert(view.datasetTimestampMs.contains(1234567890123L))
    assert(view.metadata == Map("whylogs.tag.env" -> "prod", "pipeline" -> "adv"))

    val a = view.columns("alpha")
    assert(a.counts.contains(CountsSummary(5, 2, 0, 0, 0)))
    assert(a.ints.contains(IntsSummary(Some(-5L), Some(9L))))
    val d = a.distribution.get
    assert(d.n == 4 && d.mean == 2.5 && d.m2 == 5.0)
    assert(d.min.contains(1.0) && d.max.contains(4.0))
    // cpc component had no decodable oneof member graft models → dropped,
    // and it must NOT bleed into cardinality
    assert(a.cardinality.isEmpty && a.frequentItems.isEmpty)
    assert(a.subMetrics("unicode_range")("digits").counts
      .contains(CountsSummary(3, 0, 0, 0, 0)))

    val z = view.columns("zeta")
    assert(z.counts.contains(CountsSummary(1, 0, 0, 0, 0)))
    assert(math.round(z.cardinality.get.estimate) == 3L)
    assert(z.frequentItems.get.items.exists(i => i.value == "a" && i.estimate == 2L))
    assert(z.ints.isEmpty && z.distribution.isEmpty)
  }

  test("decoded adversarial view re-serializes through graft and survives") {
    // interop closure: reference-layout file → graft view → graft bytes → view
    val once = Why1.fromBytes(adversarialBytes)
    val twice = Why1.fromBytes(Why1.toBytes(once))
    assert(twice.columns.keySet == once.columns.keySet)
    assert(twice.columns("alpha").counts == once.columns("alpha").counts)
    assert(twice.columns("alpha").ints == once.columns("alpha").ints)
    assert(twice.columns("alpha").distribution.get.kll.toSeq ==
      once.columns("alpha").distribution.get.kll.toSeq)
    assert(twice.columns("zeta").cardinality.get.hll.toSeq ==
      once.columns("zeta").cardinality.get.hll.toSeq)
    assert(twice.columns("zeta").frequentItems.get.items ==
      once.columns("zeta").frequentItems.get.items)
    assert(twice.columns("alpha").subMetrics("unicode_range")("digits").counts ==
      once.columns("alpha").subMetrics("unicode_range")("digits").counts)
  }

  test("single-segment file with the reference offset quirk reads sequentially") {
    // the reference stores the segment header's own size in offsets[0]
    // (segmented_dataset_profile_view.py:193-205) — a reader trusting the
    // offset would seek into garbage; graft reads profiles back-to-back
    val inner = frame(Seq(entry(10, intComp(0, 4L))))
    val header = new Writer().msgField(1, new Writer)
    header.msgField(2, new Writer().stringField(1, "c")
      .msgField(2, new Writer().packedVarints(1, Seq(0L))))
    header.varintField(4, inner.length.toLong)
    header.msgField(5, new Writer().varintField(1, 10L).stringField(2, "counts/n"))

    val seg = new Writer().varintField(1, 1L) // has_segments = true
    val segTag = new Writer().stringField(1, "whylogs.tag.region").stringField(2, "emea")
    seg.msgField(4, new Writer().msgField(1, segTag).stringField(2, "part-0"))
    // the quirk: the offset slot holds the segment header's size, not 0
    seg.msgField(5, new Writer().varintField(1, 0L, emitZero = true)
      .varintField(2, 999L))

    val bytes = new Writer().raw("WHY1".getBytes("UTF-8"))
      .delimited(seg).delimited(header).raw(inner).toBytes
    val back = Why1.readSegmentedBytes(bytes)
    assert(back.size == 1)
    assert(back.head.tags == Seq("region" -> "emea"))
    assert(back.head.view.columns("c").counts.get.n == 4L)
  }

  test("truncated adversarial file fails loudly, not silently") {
    val full = adversarialBytes
    intercept[IllegalArgumentException](Why1.fromBytes(full.take(full.length / 2)))
  }
}
