package graft.profile

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.memory.Memory

/** Binary (de)serialization of profile views — the analog of the
  * reference's `WHY1` delimited-protobuf container
  * (`core/view/dataset_profile_view.py:264-460`, magic `:35-38`).
  *
  * Container: `GRFT1` magic + version, dataset timestamp, metadata map,
  * then per-column length-delimited metric blocks. Sketch payloads are
  * the DataSketches compact binary images (KLL / HLL / frequent-items),
  * which are the same cross-language formats the reference embeds in its
  * protobuf chunks — so the sketch bytes themselves are interoperable
  * even though the container framing is graft's own (hand-rolled
  * protobuf framing without the reference's generated classes would be
  * a bug farm; documented divergence).
  *
  * Profiles are KB-scale (SURVEY §6: state bounded by sketch config, not
  * row count), so serde cost is irrelevant next to scan cost.
  */
object ProfileSerde {

  private val Magic = "GRFT1".getBytes("UTF-8")
  // v2: strings are length-delimited UTF-8 (writeUTF caps at 64KB of
  // modified UTF-8, which user metadata values can exceed); v1 readable.
  // v3: optional feature-weights block after model performance; v1/v2
  // files read as featureWeights = None.
  private val Version = 3

  def toBytes(view: DatasetProfileView): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(Magic)
    out.writeInt(Version)
    out.writeLong(view.datasetTimestampMs.getOrElse(-1L))
    out.writeInt(view.metadata.size)
    view.metadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
      writeStr(out, k); writeStr(out, v)
    }
    out.writeInt(view.columns.size)
    view.columns.toSeq.sortBy(_._1).foreach { case (name, col) =>
      writeStr(out, name)
      writeColumn(out, col)
    }
    writeOpt(out, view.modelPerformance) { mp =>
      writeOpt(out, mp.confusion) { cm =>
        out.writeInt(cm.cells.size)
        cm.cells.toSeq.sortBy(_._1).foreach { case ((t, p), (n, s)) =>
          writeStr(out, t); writeStr(out, p); out.writeLong(n); out.writeDouble(s)
        }
      }
      writeOpt(out, mp.regression) { r =>
        out.writeLong(r.n); out.writeDouble(r.absErrorSum)
        out.writeDouble(r.errorSum); out.writeDouble(r.sqErrorSum)
      }
    }
    writeOpt(out, view.featureWeights) { fw =>
      out.writeInt(fw.weights.size)
      fw.weights.toSeq.sortBy(_._1).foreach { case (k, v) =>
        writeStr(out, k); out.writeDouble(v)
      }
      out.writeInt(fw.metadata.size)
      fw.metadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
        writeStr(out, k); writeStr(out, v)
      }
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): DatasetProfileView = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = new Array[Byte](Magic.length)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, Magic), "not a GRFT1 profile")
    val version = in.readInt()
    require(version >= 1 && version <= Version,
      s"unsupported profile version $version")
    // v1 wrote modified-UTF8 via writeUTF; v2 writes length-delimited UTF-8
    implicit val readStr: DataInputStream => String =
      if (version == 1) (i: DataInputStream) => i.readUTF()
      else (i: DataInputStream) => new String(readBytes(i), "UTF-8")
    val ts = in.readLong()
    val nMeta = in.readInt()
    val meta = (0 until nMeta).map(_ => readStr(in) -> readStr(in)).toMap
    val nCols = in.readInt()
    val cols = (0 until nCols).map { _ =>
      val name = readStr(in)
      name -> readColumn(in)
    }.toMap
    val mp = readOpt(in) {
      val cm = readOpt(in)(ConfusionMatrixSummary(
        (0 until in.readInt()).map { _ =>
          (readStr(in), readStr(in)) -> (in.readLong(), in.readDouble())
        }.toMap))
      val rg = readOpt(in)(RegressionSummary(
        in.readLong(), in.readDouble(), in.readDouble(), in.readDouble()))
      ModelPerformanceSummary(cm, rg)
    }
    val fw =
      if (version < 3) None
      else readOpt(in) {
        val ws = (0 until in.readInt())
          .map(_ => readStr(in) -> in.readDouble()).toMap
        val md = (0 until in.readInt())
          .map(_ => readStr(in) -> readStr(in)).toMap
        FeatureWeights(ws, md)
      }
    DatasetProfileView(cols, if (ts < 0) None else Some(ts), meta, mp, fw)
  }

  // --- column blocks ---

  private def writeOpt[T](out: DataOutputStream, o: Option[T])(f: T => Unit): Unit =
    o match {
      case Some(v) => out.writeBoolean(true); f(v)
      case None    => out.writeBoolean(false)
    }

  private def readOpt[T](in: DataInputStream)(f: => T): Option[T] =
    if (in.readBoolean()) Some(f) else None

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length); out.write(b)
  }

  /** Length-delimited UTF-8 -- no 64KB writeUTF bound. */
  private def writeStr(out: DataOutputStream, s: String): Unit =
    writeBytes(out, s.getBytes("UTF-8"))

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val b = new Array[Byte](in.readInt()); in.readFully(b); b
  }

  private def writeDoubles(out: DataOutputStream, ds: Seq[Double]): Unit = {
    out.writeInt(ds.length); ds.foreach(out.writeDouble)
  }

  private def readDoubles(in: DataInputStream): Seq[Double] =
    (0 until in.readInt()).map(_ => in.readDouble())

  private def writeColumn(out: DataOutputStream, col: ColumnProfileView): Unit = {
    writeOpt(out, col.counts) { c =>
      out.writeLong(c.n); out.writeLong(c.nulls); out.writeLong(c.nan)
      out.writeLong(c.inf); out.writeLong(c.trueCount)
    }
    writeOpt(out, col.types) { t =>
      out.writeLong(t.integral); out.writeLong(t.fractional); out.writeLong(t.boolean)
      out.writeLong(t.string); out.writeLong(t.obj); out.writeLong(t.tensor)
    }
    writeOpt(out, col.ints) { i =>
      writeOpt(out, i.min)(out.writeLong); writeOpt(out, i.max)(out.writeLong)
    }
    writeOpt(out, col.distribution) { d =>
      out.writeLong(d.n); out.writeDouble(d.mean); out.writeDouble(d.m2)
      writeOpt(out, d.min)(out.writeDouble); writeOpt(out, d.max)(out.writeDouble)
      writeDoubles(out, d.quantileRanks); writeDoubles(out, d.quantiles)
      writeBytes(out, d.kll)
    }
    writeOpt(out, col.cardinality) { c =>
      out.writeDouble(c.estimate); out.writeDouble(c.lower); out.writeDouble(c.upper)
      writeBytes(out, c.hll)
    }
    writeOpt(out, col.frequentItems) { f =>
      out.writeInt(f.limit)
      out.writeInt(f.items.length)
      f.items.foreach { it =>
        writeStr(out, it.value); out.writeLong(it.estimate)
        out.writeLong(it.lower); out.writeLong(it.upper)
      }
      writeBytes(out, f.sketch)
    }
    out.writeInt(col.subMetrics.size)
    col.subMetrics.toSeq.sortBy(_._1).foreach { case (ns, subs) =>
      writeStr(out, ns)
      out.writeInt(subs.size)
      subs.toSeq.sortBy(_._1).foreach { case (sub, bundle) =>
        writeStr(out, sub)
        writeColumn(out, bundle)
      }
    }
  }

  private def readColumn(in: DataInputStream)(implicit readStr: DataInputStream => String): ColumnProfileView = {
    val counts = readOpt(in)(CountsSummary(
      in.readLong(), in.readLong(), in.readLong(), in.readLong(), in.readLong()))
    val types = readOpt(in)(TypeCountsSummary(
      in.readLong(), in.readLong(), in.readLong(), in.readLong(), in.readLong(), in.readLong()))
    val ints = readOpt(in)(IntsSummary(readOpt(in)(in.readLong()), readOpt(in)(in.readLong())))
    val dist = readOpt(in) {
      val n = in.readLong(); val mean = in.readDouble(); val m2 = in.readDouble()
      val min = readOpt(in)(in.readDouble()); val max = readOpt(in)(in.readDouble())
      val ranks = readDoubles(in); val qs = readDoubles(in)
      DistributionSummary(n, mean, m2, min, max, ranks, qs, readBytes(in))
    }
    val card = readOpt(in)(CardinalitySummary(
      in.readDouble(), in.readDouble(), in.readDouble(), readBytes(in)))
    val fi = readOpt(in) {
      val limit = in.readInt()
      val items = (0 until in.readInt()).map { _ =>
        FrequentItem(readStr(in), in.readLong(), in.readLong(), in.readLong())
      }
      FrequentItemsSummary(items, readBytes(in), limit)
    }
    val subs = (0 until in.readInt()).map { _ =>
      val ns = readStr(in)
      ns -> (0 until in.readInt()).map(_ => readStr(in) -> readColumn(in)).toMap
    }.toMap
    ColumnProfileView(counts, types, ints, dist, card, fi, subs)
  }

  /** Sanity helper: a frequent-items sketch survives its binary image. */
  private[profile] def fiRoundTrip(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  // ---- local file writer/reader (reference `api/writer/local.py`,
  // `api/reader/local.py`; the parquet ProfileStore is the scale sink) ----

  def writeTo(view: DatasetProfileView, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, toBytes(view))
  }

  def readFrom(path: String): DatasetProfileView =
    fromBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
