package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** EXIF/TIFF metadata extraction (reference
  * `python/whylogs/extras/image_metric.py:82-103`): wire-format parse of
  * IFD0 in both endiannesses, inline vs overflow values, the JPEG APP1
  * carrier, skip/fail behavior, and the DataFrame stage. */
class ExifSpec extends SparkSpec {

  /** Hand-derived golden TIFF (little-endian, IFD0 at 8, two entries):
    * Make = "X" (ASCII, inline) and Orientation = 6 (SHORT, inline) —
    * byte-for-byte per the public TIFF 6.0 spec, independent of
    * [[Exif.encodeTiff]]. */
  private val goldenTiff: Array[Byte] = Array[Int](
    'I', 'I', 0x2a, 0x00, 0x08, 0x00, 0x00, 0x00, // header, IFD0 @ 8
    0x02, 0x00, // 2 entries
    0x0f, 0x01, 0x02, 0x00, 0x02, 0x00, 0x00, 0x00, 'X', 0x00, 0x00, 0x00, // Make
    0x12, 0x01, 0x03, 0x00, 0x01, 0x00, 0x00, 0x00, 0x06, 0x00, 0x00, 0x00, // Orientation
    0x00, 0x00, 0x00, 0x00 // no next IFD
  ).map(_.toByte)

  test("golden little-endian TIFF parses exactly") {
    assert(Exif.parseTiff(goldenTiff) == Map("Make" -> "X", "Orientation" -> "6"))
  }

  test("round-trip both endiannesses: inline + overflow + rational + multi-value") {
    for (le <- Seq(true, false)) {
      val bytes = Exif.encodeTiff(Seq(
        Exif.asciiEntry(271, "graft-cam"),       // overflow ASCII (10 bytes)
        Exif.asciiEntry(272, "x1"),              // inline ASCII (3 bytes w/ NUL)
        (274, 3, Seq(7L)),                       // Orientation SHORT inline
        (282, 5, Seq(300L, 4L)),                 // XResolution RATIONAL overflow
        (258, 3, Seq(8L, 8L, 8L)),               // BitsPerSample 3 SHORTs overflow
        (306, 2, ("2024:10:24 12:00:00".getBytes("US-ASCII") :+ 0.toByte)
          .map(_.toLong & 0xff).toSeq)
      ), littleEndian = le)
      val got = Exif.parse(bytes)
      assert(got == Map(
        "Make" -> "graft-cam", "Model" -> "x1", "Orientation" -> "7",
        "XResolution" -> "300/4", "BitsPerSample" -> "8,8,8",
        "DateTime" -> "2024:10:24 12:00:00"), s"littleEndian=$le")
    }
  }

  test("negative SRATIONAL and SLONG render signed") {
    val bytes = Exif.encodeTiff(Seq(
      (282, 10, Seq((-3L) & 0xffffffffL, 2L)), // SRATIONAL -3/2 via two's complement
      (274, 9, Seq((-5L) & 0xffffffffL))))     // SLONG -5
    val got = Exif.parseTiff(bytes)
    assert(got("XResolution") == "-3/2" && got("Orientation") == "-5")
  }

  test("unknown tags and unsupported types are skipped, not fatal") {
    val bytes = Exif.encodeTiff(Seq(
      (271, 2, ("ok".getBytes("US-ASCII") :+ 0.toByte).map(_.toLong & 0xff).toSeq),
      (51234, 3, Seq(9L)),  // tag not in the name table
      (274, 13, Seq(1L))))  // IFD type (13) — unsupported, skipped
    assert(Exif.parseTiff(bytes) == Map("Make" -> "ok"))
  }

  test("JPEG APP1 carrier: segment walk finds Exif TIFF without a codec") {
    val tiff = Exif.encodeTiff(Seq((274, 3, Seq(3L)), Exif.asciiEntry(271, "jpegcam")))
    val app1Payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val app1Len = app1Payload.length + 2
    val jpeg =
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ // SOI
        // APP0 first (typical camera layout) — must be walked over
        Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x04, 0x4a, 0x46) ++
        Array[Byte](0xff.toByte, 0xe1.toByte,
          (app1Len >> 8).toByte, (app1Len & 0xff).toByte) ++ app1Payload ++
        Array[Byte](0xff.toByte, 0xda.toByte, 0x00, 0x02) // SOS: stop here
    assert(Exif.parse(jpeg) == Map("Orientation" -> "3", "Make" -> "jpegcam"))
  }

  test("formats without EXIF yield empty; truncation fails loudly") {
    val bmp = Multimodal.Bmp.encode24(2, 2, (_, _) => (1, 2, 3))
    assert(Exif.parse(bmp).isEmpty)
    // JPEG with no APP1 at all
    assert(Exif.parse(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xda.toByte, 0x00, 0x02)).isEmpty)
    val tiff = Exif.encodeTiff(Seq(Exif.asciiEntry(271, "will-be-truncated")))
    intercept[IllegalArgumentException](Exif.parseTiff(tiff.take(tiff.length - 4)))
    intercept[IllegalArgumentException](Exif.parseTiff("PK....".getBytes))
  }

  test("withExifMetadata: map column, NULL binary -> NULL map, empty for BMP") {
    import spark.implicits._
    val tiff = Exif.encodeTiff(Seq((274, 3, Seq(5L)), Exif.asciiEntry(271, "df-cam")))
    val bmp = Multimodal.Bmp.encode24(2, 2, (_, _) => (9, 9, 9))
    val df = Seq((1L, tiff), (2L, bmp), (3L, null)).toDF("id", "img")
    val got = Exif.withExifMetadata(df, "img").orderBy("id")
      .select("id", "exif").collect()
    assert(got(0).getMap[String, String](1).toMap ==
      Map("Orientation" -> "5", "Make" -> "df-cam"))
    assert(got(1).getMap[String, String](1).isEmpty)
    assert(got(2).isNullAt(1))
    // downstream expression access works (profiling path)
    val orient = Exif.withExifMetadata(df, "img")
      .select(F.element_at(F.col("exif"), "Orientation").as("o"))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(orient == Set(Some("5"), None))
  }
}
