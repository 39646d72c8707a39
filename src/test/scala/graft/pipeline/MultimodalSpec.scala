package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.pipeline.Multimodal.{Bmp, MediaDecoder}

/** Real BMP decode path: codec correctness (layout variants, integer HSV,
  * exact statistics, entropy) and the Spark operators over it. */
class MultimodalSpec extends SparkSpec {

  private val pix: (Int, Int) => (Int, Int, Int) =
    (x, y) => ((x * 53 + y * 11) % 256, (x * 7 + y * 91) % 256, (x * 29 + y * 3) % 256)

  test("hsv255: primary colors, ties, and gray axis") {
    assert(Bmp.hsv255(255, 0, 0) == (0, 255, 255)) // red
    assert(Bmp.hsv255(0, 255, 0) == (85, 255, 255)) // green: 510/6
    assert(Bmp.hsv255(0, 0, 255) == (170, 255, 255)) // blue: 1020/6
    assert(Bmp.hsv255(255, 255, 0) == (42, 255, 255)) // yellow: 60deg
    assert(Bmp.hsv255(255, 0, 255) == (212, 255, 255)) // magenta: 300deg
    assert(Bmp.hsv255(7, 7, 7) == (0, 0, 7)) // gray: no hue, no saturation
    assert(Bmp.hsv255(0, 0, 0) == (0, 0, 0))
    assert(Bmp.hsv255(128, 64, 64) == (0, 255 * 64 / 128, 128))
  }

  test("encode24/decodeStats roundtrip matches a direct per-pixel computation") {
    val (w, h) = (7, 5) // 21-byte rows -> 3 bytes padding exercised
    val stats = Bmp.decodeStats(Bmp.encode24(w, h, pix))
    assert(stats.width == w && stats.height == h && stats.colorspace == "RGB")
    val hsv = for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = pix(x, y); Bmp.hsv255(r, g, b)
    }
    val n = w * h
    def mean(xs: Seq[Int]) = xs.map(_.toLong).sum.toDouble / n
    def std(xs: Seq[Int]) = {
      val s = xs.map(_.toLong).sum; val q = xs.map(v => v.toLong * v).sum
      math.sqrt((n.toLong * q - s * s).toDouble) / n
    }
    assert(stats.hueMean == mean(hsv.map(_._1)) && stats.hueStd == std(hsv.map(_._1)))
    assert(stats.satMean == mean(hsv.map(_._2)) && stats.satStd == std(hsv.map(_._2)))
    assert(stats.brightMean == mean(hsv.map(_._3)) && stats.brightStd == std(hsv.map(_._3)))
  }

  test("top-down (negative height) BMP decodes to the same stats") {
    val (w, h) = (6, 4)
    val bottomUp = Bmp.encode24(w, h, pix)
    val rowSize = (3 * w + 3) & ~3
    val topDown = bottomUp.clone()
    val negH = -h
    topDown(22) = negH.toByte; topDown(23) = (negH >> 8).toByte
    topDown(24) = (negH >> 16).toByte; topDown(25) = (negH >> 24).toByte
    for (y <- 0 until h) // reverse row order so pixel content is identical
      System.arraycopy(bottomUp, 54 + (h - 1 - y) * rowSize, topDown, 54 + y * rowSize, rowSize)
    assert(Bmp.decodeStats(topDown) == Bmp.decodeStats(bottomUp))
  }

  test("32-bpp BMP decodes to the same stats as 24-bpp of the same pixels") {
    val (w, h) = (5, 3)
    val rowSize = 4 * w // already 4-byte aligned
    val out = new Array[Byte](54 + rowSize * h)
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'; le32(2, out.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h); out(26) = 1; out(28) = 32; le32(34, rowSize * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      val off = 54 + (h - 1 - y) * rowSize + 4 * x
      out(off) = b.toByte; out(off + 1) = g.toByte; out(off + 2) = r.toByte
      out(off + 3) = 0xff.toByte // alpha ignored
    }
    assert(Bmp.decodeStats(out) == Bmp.decodeStats(Bmp.encode24(w, h, pix)))
  }

  test("entropy over concatenated band histograms: log2(3) solid, log2(6) two-color") {
    // PIL histogram() convention: R, G, B occupy separate 256-bin ranges,
    // so ANY solid color (gray included) fills exactly 3 equal bins.
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val colored = Bmp.decodeStats(Bmp.encode24(4, 4, (_, _) => (10, 20, 30)))
    assert(math.abs(colored.entropy - log2(3.0)) < 1e-12)
    assert(colored.hueStd == 0.0 && colored.satStd == 0.0 && colored.brightStd == 0.0)
    val gray = Bmp.decodeStats(Bmp.encode24(4, 4, (_, _) => (9, 9, 9)))
    assert(math.abs(gray.entropy - log2(3.0)) < 1e-12)
    // half/half split of two colors distinct in every band: 6 bins at 1/6
    val duo = Bmp.decodeStats(Bmp.encode24(4, 4,
      (x, _) => if (x < 2) (10, 20, 30) else (40, 50, 60)))
    assert(math.abs(duo.entropy - log2(6.0)) < 1e-12)
  }

  test("malformed inputs fail loudly") {
    intercept[IllegalArgumentException](Bmp.decodeStats(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Bmp.decodeStats(Bmp.encode24(4, 4, pix).take(60))) // truncated pixels
    val compressed = Bmp.encode24(4, 4, pix).clone()
    compressed(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Bmp.decodeStats(compressed))
  }

  test("MediaDecoder.real: BMP decodes, codec-requiring formats still throw") {
    val d = MediaDecoder.real.decode(Bmp.encode24(9, 6, pix))
    assert(d.width == 9 && d.height == 6 && d.channels == 3)
    intercept[UnsupportedOperationException](
      MediaDecoder.real.decode("PNG".getBytes("ISO-8859-1")))
  }

  test("syntheticBmp + withImageStats over the corpus; NULL binary -> NULL stats") {
    import spark.implicits._
    val docs = table("documents").select("doc_id").limit(20)
    val out = Multimodal.withImageStats(Multimodal.syntheticBmp(docs, "doc_id"), "img")
    val rows = out.orderBy("doc_id").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (8 + id % 9).toInt && r.getInt(2) == (8 + id % 7).toInt)
      assert(r.getDouble(r.fieldIndex("bright_mean")) > 0.0)
    }
    val withNull = Seq((1L, Bmp.encode24(3, 3, pix)), (2L, null))
      .toDF("doc_id", "img")
    val nr = Multimodal.withImageStats(withNull, "img").orderBy("doc_id").collect()
    assert(!nr(0).isNullAt(nr(0).fieldIndex("hue_mean")))
    assert(nr(1).isNullAt(nr(1).fieldIndex("hue_mean")) &&
      nr(1).isNullAt(nr(1).fieldIndex("width")))
  }
}
