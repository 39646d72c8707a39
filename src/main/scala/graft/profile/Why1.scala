package graft.profile

import java.io.ByteArrayOutputStream

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import graft.profile.ProtoWire.{Reader, Writer}

/** Byte-level `WHY1` interop with reference whylogs v1 profiles.
  *
  * File layout (reference `core/view/dataset_profile_view.py:264-460`,
  * magic `:35-38`; message schema `proto/src/whylogs_messages.proto:39-126`):
  *
  * {{{
  *   "WHY1"                                      magic, 4 bytes
  *   <delimited DatasetSegmentHeader>            varint len + msg
  *   <delimited DatasetProfileHeader>            varint len + msg
  *   per column (sorted by name):
  *     <delimited ChunkHeader{type=COLUMN,len}>  varint len + msg
  *     <ChunkMessage bytes>                      map<uint32 -> component>
  * }}}
  *
  * Component paths are `namespace/component` (e.g. `counts/n`,
  * `distribution/kll`; reference `core/view/column_profile_view.py:67-81`),
  * indexed through `DatasetProfileHeader.indexed_metric_paths`. MultiMetric
  * submetrics flatten to `ns/sub:subns/component`
  * (`core/metrics/multimetric.py:108-123`). Sketch payloads are the
  * cross-language DataSketches images (KLL `toByteArray`, HLL
  * `toCompactByteArray`, frequent-items string serde), identical to what
  * the reference's `whylogs_sketching` embeds, so profiles round-trip at
  * the byte level between engines.
  *
  * Divergences (documented, mirrored from the reference's own v1 limits):
  *  - model-performance metrics are not part of the v1 container (the
  *    reference falls back to its v0 format for those profiles,
  *    `segmented_dataset_profile_view.py:214-222`); `GRFT1`
  *    ([[ProfileSerde]]) remains the full-fidelity native format.
  *  - derived summary fields (quantiles, HLL bounds, top-k item lists)
  *    are recomputed from the sketch images on read, exactly as the
  *    reference derives them from the deserialized sketches.
  */
object Why1 {

  private val Magic = "WHY1".getBytes("UTF-8")
  private val TagPrefix = "whylogs.tag."

  /** reference `core/metrics/metric_components.py:131-145`: only
    * ints/min (1) and ints/max (2) carry a non-zero type id. */
  private val MinTypeId = 1
  private val MaxTypeId = 2

  /** reference IntsMetric.zero (`core/metrics/metrics.py:200`):
    * min = sys.maxsize, max = -sys.maxsize. */
  private val MinSentinel = Long.MaxValue
  private val MaxSentinel = -Long.MaxValue

  // ------------------------------------------------------------------
  // component model (MetricComponentMessage, proto :39-56)
  // ------------------------------------------------------------------

  private[profile] sealed trait Value
  private[profile] final case class VInt(n: Long) extends Value
  private[profile] final case class VDouble(d: Double) extends Value
  private[profile] final case class VFs(bytes: Array[Byte]) extends Value
  private[profile] final case class VHll(bytes: Array[Byte]) extends Value
  private[profile] final case class VKll(bytes: Array[Byte]) extends Value

  private[profile] final case class Component(typeId: Int, value: Value)

  private def encodeComponent(c: Component): Writer = {
    val w = new Writer
    w.varintField(1, c.typeId.toLong)
    c.value match {
      // oneof members serialize even at default value (presence is explicit)
      case VInt(n)    => w.varintField(2, n, emitZero = true)
      case VDouble(d) => w.doubleField(3, d)
      case VFs(b)     => w.msgField(4, new Writer().bytesField(1, b))
      case VHll(b)    => w.msgField(5, new Writer().bytesField(1, b))
      case VKll(b)    => w.msgField(6, new Writer().bytesField(1, b))
    }
    w
  }

  private def decodeSketch(m: Reader): Array[Byte] = {
    var bytes = Array.emptyByteArray
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      if (f == 1 && w == ProtoWire.WireLen) bytes = m.readBytes() else m.skip(w)
    }
    bytes
  }

  private def decodeComponent(m: Reader): Option[Component] = {
    var typeId = 0
    var value: Option[Value] = None
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      (f, w) match {
        case (1, ProtoWire.WireVarint) => typeId = m.readVarint().toInt
        case (2, ProtoWire.WireVarint) => value = Some(VInt(m.readVarint()))
        case (3, ProtoWire.WireFixed64) => value = Some(VDouble(m.readDouble()))
        case (4, ProtoWire.WireLen) => value = Some(VFs(decodeSketch(m.readMessage())))
        case (5, ProtoWire.WireLen) => value = Some(VHll(decodeSketch(m.readMessage())))
        case (6, ProtoWire.WireLen) => value = Some(VKll(decodeSketch(m.readMessage())))
        // cpc (7) and the extension values (10..12) have no graft analog
        case (_, wire) => m.skip(wire)
      }
    }
    value.map(Component(typeId, _))
  }

  // ------------------------------------------------------------------
  // ColumnProfileView <-> component paths
  // ------------------------------------------------------------------

  /** Flatten one column into its (path, component) list — the exact paths
    * the reference's `get_metric_component_paths` yields. */
  private[profile] def componentsOf(col: ColumnProfileView): Seq[(String, Component)] = {
    val b = Seq.newBuilder[(String, Component)]
    def int(path: String, v: Long, typeId: Int = 0): Unit =
      b += path -> Component(typeId, VInt(v))
    col.counts.foreach { c =>
      int("counts/n", c.n); int("counts/null", c.nulls); int("counts/nan", c.nan)
      int("counts/inf", c.inf); int("counts/true", c.trueCount)
    }
    col.types.foreach { t =>
      int("types/integral", t.integral); int("types/fractional", t.fractional)
      int("types/boolean", t.boolean); int("types/string", t.string)
      int("types/object", t.obj); int("types/tensor", t.tensor)
    }
    col.ints.foreach { i =>
      int("ints/min", i.min.getOrElse(MinSentinel), MinTypeId)
      int("ints/max", i.max.getOrElse(MaxSentinel), MaxTypeId)
    }
    col.distribution.foreach { d =>
      b += "distribution/kll" -> Component(0, VKll(d.kll))
      b += "distribution/mean" -> Component(0, VDouble(d.mean))
      b += "distribution/m2" -> Component(0, VDouble(d.m2))
    }
    col.cardinality.foreach(c => b += "cardinality/hll" -> Component(0, VHll(c.hll)))
    col.frequentItems.foreach(f =>
      b += "frequent_items/frequent_strings" -> Component(0, VFs(f.sketch)))
    col.subMetrics.foreach { case (ns, subs) =>
      subs.foreach { case (sub, bundle) =>
        require(bundle.subMetrics.isEmpty,
          s"WHY1 MultiMetric submetrics cannot nest (reference multimetric.py:49); $ns/$sub does")
        componentsOf(bundle).foreach { case (p, c) => b += s"$ns/$sub:$p" -> c }
      }
    }
    b.result()
  }

  /** Rebuild a column view from decoded components; derived fields
    * (quantiles, bounds, top items) come from the sketch images. */
  private[profile] def columnFromComponents(
      comps: Seq[(String, Component)],
      ranks: Seq[Double]): ColumnProfileView = {
    val (subPaths, flat) = comps.partition(_._1.contains(":"))

    val byPath = flat.toMap
    def long(p: String): Option[Long] = byPath.get(p).collect { case Component(_, VInt(n)) => n }
    def dbl(p: String): Option[Double] = byPath.get(p).collect { case Component(_, VDouble(d)) => d }
    def ns(prefix: String): Boolean = byPath.keysIterator.exists(_.startsWith(prefix + "/"))

    val counts =
      if (ns("counts"))
        Some(CountsSummary(long("counts/n").getOrElse(0L), long("counts/null").getOrElse(0L),
          long("counts/nan").getOrElse(0L), long("counts/inf").getOrElse(0L),
          long("counts/true").getOrElse(0L)))
      else None
    val types =
      if (ns("types"))
        Some(TypeCountsSummary(long("types/integral").getOrElse(0L),
          long("types/fractional").getOrElse(0L), long("types/boolean").getOrElse(0L),
          long("types/string").getOrElse(0L), long("types/object").getOrElse(0L),
          long("types/tensor").getOrElse(0L)))
      else None
    val ints =
      if (ns("ints"))
        Some(IntsSummary(
          long("ints/min").filter(_ != MinSentinel),
          long("ints/max").filter(_ != MaxSentinel)))
      else None
    val dist = byPath.get("distribution/kll").collect { case Component(_, VKll(bytes)) =>
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
      val (mn, mx) =
        if (sk.isEmpty) (None, None) else (Some(sk.getMinItem), Some(sk.getMaxItem))
      val qs =
        if (sk.isEmpty || ranks.isEmpty) Seq.empty[Double]
        else sk.getQuantiles(ranks.toArray, QuantileSearchCriteria.INCLUSIVE).toSeq
      DistributionSummary(sk.getN, dbl("distribution/mean").getOrElse(0.0),
        dbl("distribution/m2").getOrElse(0.0), mn, mx,
        if (qs.isEmpty) Seq.empty else ranks, qs, bytes)
    }
    val card = byPath.get("cardinality/hll").collect { case Component(_, VHll(bytes)) =>
      val sk = HllSketch.heapify(bytes)
      CardinalitySummary(sk.getEstimate, sk.getLowerBound(1), sk.getUpperBound(1), bytes)
    }
    val fi = byPath.get("frequent_items/frequent_strings").collect {
      case Component(_, VFs(bytes)) =>
        val sk = ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)
        FrequentItemsSummary(FrequentItemsSummary.topItems(sk, 32), bytes)
    }

    val subs = subPaths
      .map { case (path, c) =>
        val i = path.indexOf(':')
        val (outer, inner) = (path.substring(0, i), path.substring(i + 1))
        val j = outer.indexOf('/')
        require(j > 0, s"malformed MultiMetric path: $path")
        ((outer.substring(0, j), outer.substring(j + 1)), inner -> c)
      }
      .groupBy(_._1)
      .map { case ((mns, sub), entries) => (mns, sub, entries.map(_._2)) }
      .groupBy(_._1)
      .map { case (mns, group) =>
        mns -> group.map(g => g._2 -> columnFromComponents(g._3, ranks)).toMap
      }

    ColumnProfileView(counts, types, ints, dist, card, fi, subs)
  }

  // ------------------------------------------------------------------
  // headers
  // ------------------------------------------------------------------

  private def encodeStringMapEntry(field: Int, k: String, v: String): Writer = {
    val entry = new Writer().stringField(1, k).stringField(2, v)
    new Writer().msgField(field, entry)
  }

  /** DatasetProperties (proto :66-74): tags are metadata keys carrying the
    * `whylogs.tag.` prefix (reference `dataset_profile_view.py:230-248`). */
  private def encodeProperties(view: DatasetProfileView): Writer = {
    val w = new Writer
    val ts = view.datasetTimestampMs.getOrElse(0L)
    w.varintField(4, ts) // creation_timestamp
    w.varintField(5, ts) // dataset_timestamp
    val (tags, meta) = view.metadata.partition(_._1.startsWith(TagPrefix))
    tags.toSeq.sortBy(_._1).foreach { case (k, v) => w.raw(encodeStringMapEntry(6, k, v).toBytes) }
    meta.toSeq.sortBy(_._1).foreach { case (k, v) => w.raw(encodeStringMapEntry(7, k, v).toBytes) }
    w
  }

  private final case class Header(
      datasetTimestampMs: Option[Long],
      metadata: Map[String, String],
      columnOffsets: Seq[(String, Seq[Long])],
      bodyLength: Long,
      indexedPaths: Map[Int, String])

  private def decodeStringMap(m: Reader): (String, String) = {
    var k = ""; var v = ""
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      (f, w) match {
        case (1, ProtoWire.WireLen) => k = m.readString()
        case (2, ProtoWire.WireLen) => v = m.readString()
        case _ => m.skip(w)
      }
    }
    (k, v)
  }

  private def decodeHeader(m: Reader): Header = {
    var ts = 0L
    var tags = Map.empty[String, String]
    var meta = Map.empty[String, String]
    val colOffsets = Seq.newBuilder[(String, Seq[Long])]
    var length = 0L
    var paths = Map.empty[Int, String]
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      (f, w) match {
        case (1, ProtoWire.WireLen) => // DatasetProperties
          val p = m.readMessage()
          while (p.hasRemaining) {
            val (pf, pw) = p.readTag()
            (pf, pw) match {
              case (5, ProtoWire.WireVarint) => ts = p.readVarint()
              case (6, ProtoWire.WireLen) => tags += decodeStringMap(p.readMessage())
              case (7, ProtoWire.WireLen) => meta += decodeStringMap(p.readMessage())
              case _ => p.skip(pw)
            }
          }
        case (2, ProtoWire.WireLen) => // column_offsets entry
          val e = m.readMessage()
          var name = ""
          var offs = Seq.empty[Long]
          while (e.hasRemaining) {
            val (ef, ew) = e.readTag()
            (ef, ew) match {
              case (1, ProtoWire.WireLen) => name = e.readString()
              case (2, ProtoWire.WireLen) => // ChunkOffsets
                val co = e.readMessage()
                while (co.hasRemaining) {
                  val (cf, cw) = co.readTag()
                  if (cf == 1) offs ++= co.readRepeatedVarints(cw) else co.skip(cw)
                }
              case _ => e.skip(ew)
            }
          }
          colOffsets += name -> offs
        case (4, ProtoWire.WireVarint) => length = m.readVarint()
        case (5, ProtoWire.WireLen) => // indexed_metric_paths entry
          val e = m.readMessage()
          var idx = 0
          var path = ""
          while (e.hasRemaining) {
            val (ef, ew) = e.readTag()
            (ef, ew) match {
              case (1, ProtoWire.WireVarint) => idx = e.readVarint().toInt
              case (2, ProtoWire.WireLen) => path = e.readString()
              case _ => e.skip(ew)
            }
          }
          paths += idx -> path
        case _ => m.skip(w)
      }
    }
    Header(if (ts == 0L) None else Some(ts), tags ++ meta, colOffsets.result(), length, paths)
  }

  // ------------------------------------------------------------------
  // single-profile serialize / deserialize
  // ------------------------------------------------------------------

  /** Chunk body + DatasetProfileHeader for one profile; shared by the
    * plain and segmented writers (mirrors `_do_write` / `_write_v1`). */
  private def encodeProfile(view: DatasetProfileView): (Writer, Array[Byte]) = {
    val perColumn: Seq[(String, Seq[(String, Component)])] =
      view.columns.toSeq.sortBy(_._1).map { case (n, c) => n -> componentsOf(c) }
    val pathIndex: Map[String, Int] =
      perColumn.flatMap(_._2.map(_._1)).distinct.sorted.zipWithIndex.toMap

    val body = new ByteArrayOutputStream()
    val colOffsets = Seq.newBuilder[(String, Long)]
    perColumn.foreach { case (name, comps) =>
      colOffsets += name -> body.size().toLong
      val chunk = new Writer
      comps.map { case (p, c) => pathIndex(p) -> c }.sortBy(_._1).foreach { case (idx, c) =>
        val entry = new Writer().varintField(1, idx.toLong).msgField(2, encodeComponent(c))
        chunk.msgField(1, entry)
      }
      // ChunkHeader{type=COLUMN(2), length}, delimited, then raw chunk bytes
      val hdr = new Writer().varintField(1, 2L).varintField(3, chunk.size.toLong)
      val framed = new Writer().delimited(hdr).raw(chunk.toBytes)
      framed.writeTo(body)
    }

    val header = new Writer
    header.msgField(1, encodeProperties(view))
    colOffsets.result().foreach { case (name, off) =>
      val entry = new Writer()
        .stringField(1, name)
        .msgField(2, new Writer().packedVarints(1, Seq(off)))
      header.msgField(2, entry)
    }
    header.varintField(4, body.size().toLong)
    pathIndex.toSeq.map(_.swap).sortBy(_._1).foreach { case (idx, path) =>
      val entry = new Writer().varintField(1, idx.toLong).stringField(2, path)
      header.msgField(5, entry)
    }
    (header, body.toByteArray)
  }

  def toBytes(view: DatasetProfileView): Array[Byte] = {
    val (header, body) = encodeProfile(view)
    val out = new Writer()
      .raw(Magic)
      .delimited(new Writer) // DatasetSegmentHeader{has_segments=false} = empty
      .delimited(header)
      .raw(body)
    out.toBytes
  }

  private def decodeProfileAt(r: Reader, ranks: Seq[Double]): DatasetProfileView = {
    val header = decodeHeader(r.readMessage())
    val bodyStart = r.pos
    val columns = header.columnOffsets.map { case (name, offsets) =>
      val comps = Seq.newBuilder[(String, Component)]
      offsets.foreach { off =>
        val cr = r.subReader(bodyStart + off.toInt, r.end)
        val ch = cr.readMessage() // ChunkHeader
        var chunkLen = 0
        var chunkType = 0
        while (ch.hasRemaining) {
          val (f, w) = ch.readTag()
          (f, w) match {
            case (1, ProtoWire.WireVarint) => chunkType = ch.readVarint().toInt
            case (3, ProtoWire.WireVarint) => chunkLen = ch.readVarint().toInt
            case _ => ch.skip(w)
          }
        }
        require(chunkType == 2, s"expected COLUMN chunk for $name, got type $chunkType")
        val chunk = r.subReader(cr.pos, cr.pos + chunkLen)
        while (chunk.hasRemaining) {
          val (f, w) = chunk.readTag()
          if (f == 1 && w == ProtoWire.WireLen) {
            val e = chunk.readMessage()
            var idx = 0
            var comp: Option[Component] = None
            while (e.hasRemaining) {
              val (ef, ew) = e.readTag()
              (ef, ew) match {
                case (1, ProtoWire.WireVarint) => idx = e.readVarint().toInt
                case (2, ProtoWire.WireLen) => comp = decodeComponent(e.readMessage())
                case _ => e.skip(ew)
              }
            }
            comp.foreach { c =>
              header.indexedPaths.get(idx) match {
                case Some(path) => comps += path -> c
                case None => throw new IllegalArgumentException(
                  s"missing metric path for index $idx in column $name")
              }
            }
          } else chunk.skip(w)
        }
      }
      name -> columnFromComponents(comps.result(), ranks)
    }.toMap
    // advance past this profile's body for sequential multi-profile reads
    r.pos = bodyStart + header.bodyLength.toInt
    DatasetProfileView(columns, header.datasetTimestampMs, header.metadata, None)
  }

  def fromBytes(
      bytes: Array[Byte],
      ranks: Seq[Double] = graft.metrics.DistributionAgg.DefaultQuantiles): DatasetProfileView = {
    val r = new Reader(bytes)
    checkMagic(bytes)
    r.pos = Magic.length
    r.readMessage() // DatasetSegmentHeader — single-profile read ignores it
    decodeProfileAt(r, ranks)
  }

  private def checkMagic(bytes: Array[Byte]): Unit = {
    require(bytes.length > Magic.length &&
      java.util.Arrays.equals(java.util.Arrays.copyOf(bytes, Magic.length), Magic),
      "not a WHY1 profile (bad magic)")
  }

  // ------------------------------------------------------------------
  // segmented multi-profile file (DatasetSegmentHeader, proto :102-126)
  // ------------------------------------------------------------------

  /** One segment: columnar tag values + its profile. Tag keys are column
    * names; they serialize as `whylogs.tag.<col>` SegmentTags (reference
    * `migration/converters.py:60-78`). */
  final case class SegmentProfile(tags: Seq[(String, String)], view: DatasetProfileView)

  /** Write a segmented `WHY1` file. The reference writes one segment per
    * file (`segmented_dataset_profile_view.py:116-210`) and its reader
    * takes the first profile; multiple segments here are graft's forward
    * extension of the same layout — profiles follow back-to-back, each a
    * delimited header + chunk body, with `offsets[i]` = byte offset of
    * segment i relative to the end of the segment header. */
  def toSegmentedBytes(segments: Seq[SegmentProfile], partitionId: String = "graft"): Array[Byte] = {
    require(segments.nonEmpty, "segmented WHY1 file needs at least one segment")
    val encoded = segments.map { s => (s, encodeProfile(s.view)) }

    def segmentHeader(offsets: Seq[Long]): Writer = {
      val w = new Writer().varintField(1, 1L) // has_segments = true
      encoded.foreach { case (s, _) =>
        val seg = new Writer
        s.tags.foreach { case (col, value) =>
          val tag = new Writer().stringField(1, TagPrefix + col).stringField(2, value)
          seg.msgField(1, tag)
        }
        seg.stringField(2, partitionId)
        w.msgField(4, seg)
      }
      offsets.zipWithIndex.foreach { case (off, i) =>
        val entry = new Writer().varintField(1, i.toLong).varintField(2, off)
        w.msgField(5, entry)
      }
      w
    }

    // offsets depend on nothing upstream of the segment header, so one pass
    val profileSizes = encoded.map { case (_, (h, b)) =>
      val d = new Writer().delimited(h)
      d.size.toLong + b.length
    }
    val offsets = profileSizes.scanLeft(0L)(_ + _).init

    val out = new Writer().raw(Magic).delimited(segmentHeader(offsets))
    encoded.foreach { case (_, (h, b)) => out.delimited(h).raw(b) }
    out.toBytes
  }

  /** Read every segment of a `WHY1` file (plain single-profile files
    * return one entry with no tags). Profiles are read sequentially —
    * the layout is self-describing via each header's `length` — which
    * also tolerates the reference's single-segment offset quirk
    * (`segmented_dataset_profile_view.py:193-205` stores the segment
    * header's own size there). */
  def readSegmentedBytes(
      bytes: Array[Byte],
      ranks: Seq[Double] = graft.metrics.DistributionAgg.DefaultQuantiles): Seq[SegmentProfile] = {
    checkMagic(bytes)
    val r = new Reader(bytes)
    r.pos = Magic.length
    val segHdr = r.readMessage()
    val tagsBySegment = Seq.newBuilder[Seq[(String, String)]]
    while (segHdr.hasRemaining) {
      val (f, w) = segHdr.readTag()
      if (f == 4 && w == ProtoWire.WireLen) {
        val seg = segHdr.readMessage()
        val tags = Seq.newBuilder[(String, String)]
        while (seg.hasRemaining) {
          val (sf, sw) = seg.readTag()
          if (sf == 1 && sw == ProtoWire.WireLen) {
            val (k, v) = decodeStringMap(seg.readMessage())
            tags += k.stripPrefix(TagPrefix) -> v
          } else seg.skip(sw)
        }
        tagsBySegment += tags.result()
      } else segHdr.skip(w)
    }
    val allTags = tagsBySegment.result()
    val profiles = Seq.newBuilder[DatasetProfileView]
    while (r.hasRemaining) profiles += decodeProfileAt(r, ranks)
    profiles.result().zipWithIndex.map { case (v, i) =>
      SegmentProfile(allTags.lift(i).getOrElse(Seq.empty), v)
    }
  }

  // ------------------------------------------------------------------
  // file helpers (reference api/writer/local.py analog)
  // ------------------------------------------------------------------

  def writeTo(view: DatasetProfileView, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, toBytes(view))
  }

  def readFrom(path: String): DatasetProfileView =
    fromBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
