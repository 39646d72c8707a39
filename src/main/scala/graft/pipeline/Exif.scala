package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pure-JVM EXIF/TIFF metadata extraction — the codec-free half of the
  * reference's image metadata path (reference
  * `python/whylogs/extras/image_metric.py:82-103`: `img.getexif()` mapped
  * through PIL's tag-name table, rationals rendered as strings, unknown
  * tags skipped). Reading EXIF needs no image codec: a TIFF container is
  * pure binary offsets (byte-order mark, magic 42, IFD entry table), and
  * a JPEG's APP1 segment embeds the same TIFF structure — so metadata
  * extraction works here even though pixel DECODE of compressed formats
  * does not (see [[Multimodal.MediaDecoder.real]]).
  *
  * Wire format per the public TIFF 6.0 / EXIF 2.3 specifications. Only
  * IFD0 (the image IFD — what PIL's `getexif()` returns) is read; the
  * private Exif/GPS sub-IFDs hang off pointer tags and are left as their
  * numeric offsets, exactly like PIL's top-level dict.
  *
  * Divergence (documented): PIL renders `IFDRational` via Python
  * `Fraction` formatting; graft renders RATIONAL/SRATIONAL as
  * `"num/den"` verbatim — the lossless form — since Python float
  * repr is not portable to the JVM.
  */
object Exif {

  /** Standard tag names (TIFF 6.0 §8 + EXIF 2.3 table 4 — the subset of
    * PIL's `TiffTags.TAGS` that appears in IFD0 in practice). Tags absent
    * here are skipped, mirroring the reference's KeyError-skip. */
  private[pipeline] val TagNames: Map[Int, String] = Map(
    256 -> "ImageWidth", 257 -> "ImageLength", 258 -> "BitsPerSample",
    259 -> "Compression", 262 -> "PhotometricInterpretation",
    270 -> "ImageDescription", 271 -> "Make", 272 -> "Model",
    274 -> "Orientation", 277 -> "SamplesPerPixel", 282 -> "XResolution",
    283 -> "YResolution", 296 -> "ResolutionUnit", 305 -> "Software",
    306 -> "DateTime", 315 -> "Artist", 316 -> "HostComputer",
    33432 -> "Copyright", 34665 -> "ExifOffset", 34853 -> "GPSInfo",
    40961 -> "ColorSpace", 36867 -> "DateTimeOriginal")

  private final class Cursor(bytes: Array[Byte], littleEndian: Boolean) {
    def u16(i: Int): Int = {
      require(i >= 0 && i + 2 <= bytes.length, "truncated EXIF (u16)")
      if (littleEndian) (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      else ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    }
    def u32(i: Int): Long = {
      require(i >= 0 && i + 4 <= bytes.length, "truncated EXIF (u32)")
      if (littleEndian)
        (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      else
        ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
          ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    }
    def ascii(i: Int, n: Int): String = {
      require(i >= 0 && i + n <= bytes.length, "truncated EXIF (ascii)")
      val end = {
        var e = i
        while (e < i + n && bytes(e) != 0) e += 1
        e
      }
      new String(bytes, i, end - i, "US-ASCII")
    }
  }

  /** Field byte width per TIFF type id; 0 = unsupported (skipped). */
  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1 // BYTE, ASCII, SBYTE, UNDEFINED
    case 3 | 8         => 2 // SHORT, SSHORT
    case 4 | 9         => 4 // LONG, SLONG
    case 5 | 10        => 8 // RATIONAL, SRATIONAL
    case _             => 0
  }

  /** Parse a TIFF byte stream's IFD0 into (tagName -> rendered value).
    * Values: integer types render as decimal (first value if count 1,
    * comma-joined otherwise, like PIL's tuple), ASCII as the
    * NUL-terminated string, rationals as `num/den`. Malformed input
    * throws — no silent partial metadata. */
  def parseTiff(bytes: Array[Byte]): Map[String, String] = {
    require(bytes.length >= 8, "truncated TIFF header")
    val littleEndian = (bytes(0), bytes(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException("not TIFF (bad byte-order mark)")
    }
    val c = new Cursor(bytes, littleEndian)
    require(c.u16(2) == 42, "not TIFF (bad magic)")
    val ifdOff = c.u32(4).toInt
    val nEntries = c.u16(ifdOff)
    (0 until nEntries).flatMap { e =>
      val off = ifdOff + 2 + e * 12
      val tag = c.u16(off)
      val typ = c.u16(off + 2)
      val count = c.u32(off + 4).toInt
      val sz = typeSize(typ)
      TagNames.get(tag).flatMap { name =>
        if (sz == 0 || count <= 0) None
        else {
          val total = sz * count
          // values <= 4 bytes live inline in the offset slot
          val valOff = if (total <= 4) off + 8 else c.u32(off + 8).toInt
          val rendered = typ match {
            case 2 => c.ascii(valOff, count)
            case 1 | 7 =>
              (0 until count).map(i => (bytes(valOff + i) & 0xff).toString).mkString(",")
            case 6 => (0 until count).map(i => bytes(valOff + i).toString).mkString(",")
            case 3 => (0 until count).map(i => c.u16(valOff + i * 2).toString).mkString(",")
            case 8 => (0 until count).map(i => c.u16(valOff + i * 2).toShort.toString).mkString(",")
            case 4 => (0 until count).map(i => c.u32(valOff + i * 4).toString).mkString(",")
            case 9 => (0 until count).map(i => c.u32(valOff + i * 4).toInt.toString).mkString(",")
            case 5 => (0 until count).map { i =>
              s"${c.u32(valOff + i * 8)}/${c.u32(valOff + i * 8 + 4)}"
            }.mkString(",")
            case 10 => (0 until count).map { i =>
              s"${c.u32(valOff + i * 8).toInt}/${c.u32(valOff + i * 8 + 4).toInt}"
            }.mkString(",")
          }
          Some(name -> rendered)
        }
      }
    }.toMap
  }

  /** Extract the EXIF map from media bytes: raw TIFF, or a JPEG whose
    * APP1 segment carries `Exif\0\0` + TIFF (segment walk only — no pixel
    * decode, so this works codec-free). Formats with no EXIF container
    * (BMP) or JPEGs without an APP1 yield an empty map. */
  def parse(bytes: Array[Byte]): Map[String, String] = {
    if (bytes.length >= 4 &&
        ((bytes(0) == 'I' && bytes(1) == 'I') || (bytes(0) == 'M' && bytes(1) == 'M')))
      parseTiff(bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments until APP1/SOS
      var i = 2
      var out = Map.empty[String, String]
      var done = false
      while (!done && i + 4 <= bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) done = true
        else {
          val marker = bytes(i + 1) & 0xff
          if (marker == 0xda || marker == 0xd9) done = true // SOS/EOI: no more metadata
          else {
            val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
            require(len >= 2 && i + 2 + len <= bytes.length, "truncated JPEG segment")
            if (marker == 0xe1 && len >= 8 &&
                new String(bytes, i + 4, 4, "US-ASCII") == "Exif" &&
                bytes(i + 8) == 0 && bytes(i + 9) == 0) {
              out = parseTiff(java.util.Arrays.copyOfRange(bytes, i + 10, i + 2 + len))
              done = true
            }
            i += 2 + len
          }
        }
      }
      out
    } else Map.empty
  }

  /** Decode stage: per-partition streaming EXIF extraction into a
    * `map<string,string>` column (same batch shape as
    * [[Multimodal.decodeMetadata]]; NULL binaries yield NULL maps,
    * EXIF-free formats yield empty maps). */
  def withExifMetadata(df: DataFrame, binCol: String, out: String = "exif"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(out, MapType(StringType, StringType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val exif: Any = if (bytes == null) null else parse(bytes)
        Row.fromSeq(row.toSeq :+ exif)
      }
    }(encoder)
  }

  /** Minimal TIFF encoder for fixtures and tests: writes IFD0 with the
    * given (tag, type, values) entries in either endianness. Value data
    * larger than 4 bytes is placed after the IFD, per spec. */
  private[graft] def encodeTiff(
      entries: Seq[(Int, Int, Seq[Long])], littleEndian: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (littleEndian) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit =
      if (littleEndian) { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
      else { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }

    w8(if (littleEndian) 'I' else 'M'); w8(if (littleEndian) 'I' else 'M')
    w16(42); w32(8L) // IFD0 at offset 8
    val sorted = entries.sortBy(_._1) // spec: ascending tag order
    w16(sorted.size)
    // overflow data region starts after the IFD table + next-IFD pointer
    var dataOff = 8 + 2 + sorted.size * 12 + 4
    val overflow = new java.io.ByteArrayOutputStream()
    def writeValues(typ: Int, vs: Seq[Long], sink: Long => Unit, u16Sink: Int => Unit,
        u8Sink: Int => Unit): Unit =
      typ match {
        case 1 | 2 | 6 | 7 => vs.foreach(v => u8Sink(v.toInt))
        case 3 | 8         => vs.foreach(v => u16Sink(v.toInt))
        case 4 | 9         => vs.foreach(sink)
        case 5 | 10        => vs.foreach(sink) // caller passes num,den interleaved
        case _             => vs.foreach(sink) // unknown type: raw 4-byte slot (tests)
      }
    sorted.foreach { case (tag, typ, vs) =>
      val count = if (typ == 5 || typ == 10) vs.size / 2 else vs.size
      val total = typeSize(typ) * count
      w16(tag); w16(typ); w32(count.toLong)
      if (total <= 4) {
        // inline: write values then zero-pad the 4-byte slot
        val before = out.size()
        writeValues(typ, vs, w32, w16, w8)
        (0 until (4 - (out.size() - before))).foreach(_ => w8(0))
      } else {
        w32(dataOff.toLong)
        val obefore = overflow.size()
        def o8(v: Int): Unit = overflow.write(v & 0xff)
        def o16(v: Int): Unit =
          if (littleEndian) { o8(v); o8(v >> 8) } else { o8(v >> 8); o8(v) }
        def o32(v: Long): Unit =
          if (littleEndian) { o8(v.toInt); o8((v >> 8).toInt); o8((v >> 16).toInt); o8((v >> 24).toInt) }
          else { o8((v >> 24).toInt); o8((v >> 16).toInt); o8((v >> 8).toInt); o8(v.toInt) }
        writeValues(typ, vs, o32, o16, o8)
        dataOff += overflow.size() - obefore
      }
    }
    w32(0L) // no next IFD
    overflow.writeTo(out)
    out.toByteArray
  }

  /** ASCII helper for [[encodeTiff]]: string -> (type 2, byte values incl.
    * NUL terminator). */
  private[graft] def asciiEntry(tag: Int, s: String): (Int, Int, Seq[Long]) =
    (tag, 2, (s.getBytes("US-ASCII") :+ 0.toByte).map(_.toLong & 0xff).toSeq)

  /** Deterministic synthetic TIFF fixture per row — REAL bytes through the
    * real encoder with closed-form tag values derivable from `idCol`
    * alone, alternating endianness by id parity so both wire layouts run
    * in the oracle-gated path: Make = "graft-" + id%5, Model = "mx" +
    * id%3, Orientation = 1 + id%8, XResolution = (72 + id%100)/1,
    * DateTime = 2024:01:<1 + id%28> 00:00:00. */
  def syntheticTiff(df: DataFrame, idCol: String, out: String = "img"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(out, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val bytes = encodeTiff(Seq(
          asciiEntry(271, s"graft-${id % 5}"),
          asciiEntry(272, s"mx${id % 3}"),
          (274, 3, Seq(1L + id % 8)),
          (282, 5, Seq(72L + id % 100, 1L)),
          asciiEntry(306, f"2024:01:${1 + id % 28}%02d 00:00:00")),
          littleEndian = id % 2 == 0)
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }(encoder)
  }
}
