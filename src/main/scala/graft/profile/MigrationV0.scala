package graft.profile

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.{KllDoublesSketch, KllFloatsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import graft.profile.ProtoWire.{Reader, Writer}

/** v0 whylogs profile migration (reference `migration/converters.py`):
  * the legacy `DatasetProfileMessageV0` delimited-protobuf format
  * (`proto/v0/v0_messages.proto:98-125`), readable into a
  * [[DatasetProfileView]] and writable from one — the write side applies
  * the reference's "uncompound" flattening (`migration/uncompound.py:26-96`)
  * so MultiMetric submetrics become `column.submetric` pseudo-columns a
  * v0 consumer understands.
  *
  * Field mapping mirrors `v0_to_v1_view` (`converters.py:120-184`):
  * counts from `counters` (the reference migration drops true_count,
  * converters.py:260-268; graft preserves it when present);
  * types from `schema.typeCounts` (UNKNOWN → object); ints from
  * `numbers.longs` (∓Long.MaxValue zeros → absent); distribution from
  * `numbers.histogram` + `variance{count,sum=m2,mean}`; cardinality /
  * frequent-items from the DataSketches images.
  *
  * Documented approximations:
  *  - a v0 `kll_floats` histogram (pre-doubles profiles) is rebuilt into
  *    a doubles sketch from 8192 evenly-spaced quantile samples — rank
  *    error ≤ the float sketch's own ~1.7% (k=128) + 1/8192;
  *    doubles-histogram profiles convert bit-exactly.
  *  - confusion-matrix cells migrate as (count, score sum): graft keeps
  *    exact per-cell score sums where the reference keeps score KLLs, so
  *    cell mean round-trips, the cell's score distribution does not.
  */
object MigrationV0 {

  private val V0KllK = 128 // reference `converters.py:47` _DEFAULT_V0_KLL_K
  private val V0LgK = 12 // _DEFAULT_V0_LG_MAX_K

  // InferredType.Type (v0_messages.proto:16-27)
  private val TUnknown = 0
  private val TFractional = 2
  private val TIntegral = 3
  private val TBoolean = 4
  private val TString = 5
  private val TNull = 1

  // ------------------------------------------------------------------
  // read: v0 bytes -> DatasetProfileView
  // ------------------------------------------------------------------

  def readV0(path: String): DatasetProfileView =
    fromV0Bytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  def fromV0Bytes(
      bytes: Array[Byte],
      ranks: Seq[Double] = graft.metrics.DistributionAgg.DefaultQuantiles): DatasetProfileView = {
    val top = new Reader(bytes)
    val msg = top.readMessage() // delimited DatasetProfileMessageV0
    var ts: Option[Long] = None
    var meta = Map.empty[String, String]
    var tags = Map.empty[String, String]
    val cols = Map.newBuilder[String, ColumnProfileView]
    var modelPerf: Option[ModelPerformanceSummary] = None
    while (msg.hasRemaining) {
      val (f, w) = msg.readTag()
      (f, w) match {
        case (1, ProtoWire.WireLen) => // DatasetPropertiesV0
          val p = msg.readMessage()
          while (p.hasRemaining) {
            val (pf, pw) = p.readTag()
            (pf, pw) match {
              case (5, ProtoWire.WireVarint) =>
                val v = p.readVarint(); if (v != 0L) ts = Some(v)
              case (6, ProtoWire.WireLen) => tags += readStrMap(p.readMessage())
              case (7, ProtoWire.WireLen) => meta += readStrMap(p.readMessage())
              case _ => p.skip(pw)
            }
          }
        case (2, ProtoWire.WireLen) => // columns map entry
          val e = msg.readMessage()
          var name = ""
          var col = ColumnProfileView()
          while (e.hasRemaining) {
            val (ef, ew) = e.readTag()
            (ef, ew) match {
              case (1, ProtoWire.WireLen) => name = e.readString()
              case (2, ProtoWire.WireLen) => col = readColumnV0(e.readMessage(), ranks)
              case _ => e.skip(ew)
            }
          }
          cols += name -> col
        case (10, ProtoWire.WireLen) => modelPerf = readModelProfile(msg.readMessage())
        case _ => msg.skip(w)
      }
    }
    // v0 tags merge into metadata on migration (`converters.py:160-172`)
    DatasetProfileView(cols.result(), ts, meta ++ tags, modelPerf)
  }

  private def readStrMap(m: Reader): (String, String) = {
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

  /** google.protobuf.Int64Value { int64 value = 1 } */
  private def readInt64Value(m: Reader): Long = {
    var v = 0L
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      if (f == 1 && w == ProtoWire.WireVarint) v = m.readVarint() else m.skip(w)
    }
    v
  }

  private final case class NumbersV0(
      varCount: Long, varSum: Double, varMean: Double,
      // presence tracked at the LongsMessage level: proto3 omits
      // zero-valued min/max fields inside a present message
      longs: Option[(Long, Long)],
      doublesCount: Long, doublesSum: Double,
      histogram: Array[Byte])

  private def readNumbers(m: Reader): NumbersV0 = {
    var vc = 0L; var vs = 0.0; var vm = 0.0
    var longs: Option[(Long, Long)] = None
    var dc = 0L; var ds = 0.0
    var hist = Array.emptyByteArray
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      (f, w) match {
        case (1, ProtoWire.WireLen) => // VarianceMessage{count,sum,mean}
          val v = m.readMessage()
          while (v.hasRemaining) {
            val (vf, vw) = v.readTag()
            (vf, vw) match {
              case (1, ProtoWire.WireVarint) => vc = v.readVarint()
              case (2, ProtoWire.WireFixed64) => vs = v.readDouble()
              case (3, ProtoWire.WireFixed64) => vm = v.readDouble()
              case _ => v.skip(vw)
            }
          }
        case (2, ProtoWire.WireLen) => // DoublesMessage{count,min,max,sum}
          val d = m.readMessage()
          while (d.hasRemaining) {
            val (df, dw) = d.readTag()
            (df, dw) match {
              case (1, ProtoWire.WireVarint) => dc = d.readVarint()
              case (4, ProtoWire.WireFixed64) => ds = d.readDouble()
              case _ => d.skip(dw)
            }
          }
        case (3, ProtoWire.WireLen) => // LongsMessage{count,min,max,sum}
          val l = m.readMessage()
          var lMin = 0L; var lMax = 0L
          while (l.hasRemaining) {
            val (lf, lw) = l.readTag()
            (lf, lw) match {
              case (2, ProtoWire.WireVarint) => lMin = l.readVarint()
              case (3, ProtoWire.WireVarint) => lMax = l.readVarint()
              case _ => l.skip(lw)
            }
          }
          longs = Some((lMin, lMax))
        case (4, ProtoWire.WireLen) => hist = m.readBytes()
        case _ => m.skip(w)
      }
    }
    NumbersV0(vc, vs, vm, longs, dc, ds, hist)
  }

  /** Returns (sketch, exact): a doubles image heapifies bit-exactly; a
    * float image is approximately rebuilt (the sketch's internal n is then
    * the sample count, so callers take n from the variance tracker). */
  private[graft] def histogramToDoubles(bytes: Array[Byte]): Option[(KllDoublesSketch, Boolean)] = {
    if (bytes.isEmpty) return None
    try Some((KllDoublesSketch.heapify(Memory.wrap(bytes)), true))
    catch {
      case _: Exception =>
        val fs = KllFloatsSketch.heapify(Memory.wrap(bytes))
        val out = KllDoublesSketch.newHeapInstance(math.max(8, fs.getK))
        if (!fs.isEmpty) {
          val m = math.min(fs.getN, 8192L).toInt
          var i = 0
          while (i < m) {
            out.update(fs.getQuantile((i + 0.5) / m, QuantileSearchCriteria.INCLUSIVE).toDouble)
            i += 1
          }
        }
        Some((out, false))
    }
  }

  private def readColumnV0(m: Reader, ranks: Seq[Double]): ColumnProfileView = {
    var count = 0L; var nulls = 0L; var trues = 0L
    var typeCounts = Map.empty[Int, Long]
    var numbers: Option[NumbersV0] = None
    var fiBytes = Array.emptyByteArray
    var hllBytes = Array.emptyByteArray
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      (f, w) match {
        case (2, ProtoWire.WireLen) => // CountersV0
          val c = m.readMessage()
          while (c.hasRemaining) {
            val (cf, cw) = c.readTag()
            (cf, cw) match {
              case (1, ProtoWire.WireVarint) => count = c.readVarint()
              case (2, ProtoWire.WireLen) => trues = readInt64Value(c.readMessage())
              case (3, ProtoWire.WireLen) => nulls = readInt64Value(c.readMessage())
              case _ => c.skip(cw)
            }
          }
        case (3, ProtoWire.WireLen) => // SchemaMessageV0
          val s = m.readMessage()
          while (s.hasRemaining) {
            val (sf, sw) = s.readTag()
            if (sf == 1 && sw == ProtoWire.WireLen) {
              val e = s.readMessage()
              var k = 0; var v = 0L
              while (e.hasRemaining) {
                val (ef, ew) = e.readTag()
                (ef, ew) match {
                  case (1, ProtoWire.WireVarint) => k = e.readVarint().toInt
                  case (2, ProtoWire.WireVarint) => v = e.readVarint()
                  case _ => e.skip(ew)
                }
              }
              typeCounts += k -> v
            } else s.skip(sw)
          }
        case (4, ProtoWire.WireLen) => numbers = Some(readNumbers(m.readMessage()))
        case (7, ProtoWire.WireLen) => // FrequentItemsSketchMessageV0
          val fi = m.readMessage()
          while (fi.hasRemaining) {
            val (ff, fw) = fi.readTag()
            if (ff == 1 && fw == ProtoWire.WireLen) fiBytes = fi.readBytes() else fi.skip(fw)
          }
        case (8, ProtoWire.WireLen) => // HllSketchMessageV0
          val h = m.readMessage()
          while (h.hasRemaining) {
            val (hf, hw) = h.readTag()
            if (hf == 1 && hw == ProtoWire.WireLen) hllBytes = h.readBytes() else h.skip(hw)
          }
        case _ => m.skip(w)
      }
    }
    // the reference migration drops true_count (converters.py:260-268);
    // graft preserves it when the v0 writer recorded one
    val counts = Some(CountsSummary(count, nulls, 0, 0, trues))
    val types = Some(TypeCountsSummary(
      typeCounts.getOrElse(TIntegral, 0L), typeCounts.getOrElse(TFractional, 0L),
      typeCounts.getOrElse(TBoolean, 0L), typeCounts.getOrElse(TString, 0L),
      typeCounts.getOrElse(TUnknown, 0L), 0L))
    val ints = numbers.flatMap(_.longs).map { case (mn, mx) =>
      IntsSummary(Some(mn).filter(_ != Long.MaxValue), Some(mx).filter(_ != -Long.MaxValue))
    }
    val dist = numbers.flatMap { n =>
      histogramToDoubles(n.histogram).map { case (sk, exact) =>
        val (mn, mx) = if (sk.isEmpty) (None, None) else (Some(sk.getMinItem), Some(sk.getMaxItem))
        val qs =
          if (sk.isEmpty || ranks.isEmpty) Seq.empty[Double]
          else sk.getQuantiles(ranks.toArray, QuantileSearchCriteria.INCLUSIVE).toSeq
        // reference DistributionMetric.n = kll.get_n(); a rebuilt float
        // sketch's internal n is the sample count, so use the variance
        // tracker's count there instead
        val distN = if (exact) sk.getN else n.varCount
        // keep the original image on the exact path: re-serializing
        // normalizes level-zero sort state and breaks byte identity
        val kllBytes = if (exact) n.histogram else sk.toByteArray
        DistributionSummary(distN, n.varMean, n.varSum, mn, mx,
          if (qs.isEmpty) Seq.empty else ranks, qs, kllBytes)
      }
    }
    val card =
      if (hllBytes.isEmpty) None
      else {
        val sk = HllSketch.heapify(hllBytes)
        Some(CardinalitySummary(sk.getEstimate, sk.getLowerBound(1), sk.getUpperBound(1),
          sk.toCompactByteArray))
      }
    val fi =
      if (fiBytes.isEmpty) None
      else {
        val sk = ItemsSketch.getInstance[String](Memory.wrap(fiBytes), new ArrayOfStringsSerDe)
        Some(FrequentItemsSummary(FrequentItemsSummary.topItems(sk, 32), fiBytes))
      }
    ColumnProfileView(counts, types, ints, dist, card, fi)
  }

  private def readModelProfile(m: Reader): Option[ModelPerformanceSummary] = {
    var confusion: Option[ConfusionMatrixSummary] = None
    var regression: Option[RegressionSummary] = None
    while (m.hasRemaining) {
      val (f, w) = m.readTag()
      if (f == 10 && w == ProtoWire.WireLen) { // ModelMetricsMessage
        val mm = m.readMessage()
        while (mm.hasRemaining) {
          val (mf, mw) = mm.readTag()
          (mf, mw) match {
            case (1, ProtoWire.WireLen) => // ScoreMatrixMessage
              val sm = mm.readMessage()
              val labels = Seq.newBuilder[String]
              val cells = Seq.newBuilder[(Long, Double)]
              while (sm.hasRemaining) {
                val (sf, sw) = sm.readTag()
                (sf, sw) match {
                  case (1, ProtoWire.WireLen) => labels += sm.readString()
                  case (10, ProtoWire.WireLen) =>
                    val n = readNumbers(sm.readMessage())
                    // cell count from the variance tracker; score sum =
                    // mean·count (graft keeps the exact sum, v0 the mean)
                    cells += ((n.varCount, n.varMean * n.varCount))
                  case _ => sm.skip(sw)
                }
              }
              val ls = labels.result()
              val cs = cells.result()
              if (ls.nonEmpty && cs.length == ls.length * ls.length) {
                val map = (for {
                  i <- ls.indices; j <- ls.indices
                  (n, s) = cs(i * ls.length + j) if n != 0L || s != 0.0
                } yield (ls(i), ls(j)) -> (n, s)).toMap
                confusion = Some(ConfusionMatrixSummary(map))
              }
            case (3, ProtoWire.WireLen) => // RegressionMetricsMessage
              val r = mm.readMessage()
              var n = 0L; var sad = 0.0; var sd = 0.0; var s2d = 0.0
              while (r.hasRemaining) {
                val (rf, rw) = r.readTag()
                (rf, rw) match {
                  case (3, ProtoWire.WireVarint) => n = r.readVarint()
                  case (4, ProtoWire.WireFixed64) => sad = r.readDouble()
                  case (5, ProtoWire.WireFixed64) => sd = r.readDouble()
                  case (6, ProtoWire.WireFixed64) => s2d = r.readDouble()
                  case _ => r.skip(rw)
                }
              }
              if (n != 0) regression = Some(RegressionSummary(n, sad, sd, s2d))
            case _ => mm.skip(mw)
          }
        }
      } else m.skip(w)
    }
    if (confusion.isEmpty && regression.isEmpty) None
    else Some(ModelPerformanceSummary(confusion, regression))
  }

  // ------------------------------------------------------------------
  // write: DatasetProfileView -> v0 bytes (reference
  // `v1_to_dataset_profile_message_v0`, converters.py:335-384)
  // ------------------------------------------------------------------

  def writeV0(view: DatasetProfileView, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, toV0Bytes(view))
  }

  def toV0Bytes(view: DatasetProfileView): Array[Byte] = {
    val msg = new Writer

    val props = new Writer
    props.varintField(1, 1L) // schema_major_version = 1 (converters.py:357)
    props.varintField(2, 2L) // schema_minor_version = 2
    props.varintField(4, view.datasetTimestampMs.getOrElse(0L)) // session_timestamp
    props.varintField(5, view.datasetTimestampMs.getOrElse(0L)) // data_timestamp
    view.metadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
      props.msgField(7, new Writer().stringField(1, k).stringField(2, v))
    }
    msg.msgField(1, props)

    // uncompound MultiMetric submetrics into column.submetric pseudo-columns
    // (uncompound.py:43-45) — a v0 consumer has no compound metrics
    val flattened: Seq[(String, ColumnProfileView)] =
      view.columns.toSeq.flatMap { case (name, col) =>
        (name -> col.copy(subMetrics = Map.empty)) +:
          col.subMetrics.toSeq.flatMap { case (_, subs) =>
            subs.toSeq.map { case (sub, bundle) => s"$name.$sub" -> bundle }
          }
      }.sortBy(_._1)

    flattened.foreach { case (name, col) =>
      val entry = new Writer().stringField(1, name).msgField(2, encodeColumnV0(name, col))
      msg.msgField(2, entry)
    }

    view.modelPerformance.foreach { mp =>
      val metrics = new Writer
      mp.confusion.foreach { cm =>
        val labels = (cm.cells.keysIterator.flatMap(k => Seq(k._1, k._2))).toSeq.distinct.sorted
        val sm = new Writer
        labels.foreach(sm.stringField(1, _))
        labels.foreach { t =>
          labels.foreach { p =>
            val (n, s) = cm.cells.getOrElse((t, p), (0L, 0.0))
            val numbers = new Writer
            val variance = new Writer
            variance.varintField(1, n)
            if (n > 0) variance.doubleField(3, s / n) // cell mean; sum recovers on read
            numbers.msgField(1, variance)
            sm.msgField(10, numbers)
          }
        }
        metrics.msgField(1, sm)
      }
      mp.regression.foreach { r =>
        val rm = new Writer
        rm.varintField(3, r.n)
        rm.doubleField(4, r.absErrorSum)
        rm.doubleField(5, r.errorSum)
        rm.doubleField(6, r.sqErrorSum)
        metrics.msgField(3, rm)
      }
      msg.msgField(10, new Writer().msgField(10, metrics))
    }

    new Writer().delimited(msg).toBytes
  }

  private lazy val emptyKll: Array[Byte] =
    KllDoublesSketch.newHeapInstance(V0KllK).toByteArray

  private def encodeColumnV0(name: String, col: ColumnProfileView): Writer = {
    val w = new Writer
    w.stringField(1, name)

    val counters = new Writer
    counters.varintField(1, col.counts.map(_.n).getOrElse(0L))
    col.counts.filter(_.trueCount > 0).foreach(c =>
      counters.msgField(2, new Writer().varintField(1, c.trueCount)))
    col.counts.foreach(c =>
      counters.msgField(3, new Writer().varintField(1, c.nulls)))
    w.msgField(2, counters)

    val schema = new Writer
    def typeEntry(t: Int, n: Long): Unit =
      if (n != 0) schema.msgField(1, new Writer().varintField(1, t.toLong).varintField(2, n))
    col.types.foreach { t =>
      typeEntry(TIntegral, t.integral); typeEntry(TBoolean, t.boolean)
      typeEntry(TFractional, t.fractional); typeEntry(TString, t.string)
      typeEntry(TUnknown, t.obj)
    }
    col.counts.foreach(c => typeEntry(TNull, c.nulls))
    w.msgField(3, schema)

    val numbers = new Writer
    val variance = new Writer
    col.counts.foreach(c => variance.varintField(1, c.n))
    col.distribution.filter(_.n > 0).foreach { d =>
      variance.doubleField(2, d.m2) // VarianceMessage.sum carries m2
      variance.doubleField(3, d.mean)
    }
    numbers.msgField(1, variance)
    col.ints.foreach { i =>
      val longs = new Writer
      longs.varintField(2, i.min.getOrElse(Long.MaxValue))
      longs.varintField(3, i.max.getOrElse(-Long.MaxValue))
      numbers.msgField(3, longs)
    }
    numbers.bytesField(4, col.distribution.map(_.kll).getOrElse(emptyKll))
    w.msgField(4, numbers)

    col.frequentItems.foreach { f =>
      w.msgField(7, new Writer().bytesField(1, f.sketch).varintField(2, V0LgK.toLong))
    }
    col.cardinality.foreach { c =>
      w.msgField(8, new Writer().bytesField(1, c.hll).varintField(2, V0LgK.toLong))
    }
    w
  }
}
