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

  test("MediaDecoder.real: BMP and PNG decode, non-image bytes still throw") {
    val d = MediaDecoder.real.decode(Bmp.encode24(9, 6, pix))
    assert(d.width == 9 && d.height == 6 && d.channels == 3)
    val p = MediaDecoder.real.decode(Multimodal.ImageIo.encode(9, 6, "png", pix))
    assert(p.width == 9 && p.height == 6 && p.channels == 3)
    assert(math.abs(p.featureNorm - d.featureNorm) < 1e-12,
      "PNG and BMP of the same pixels must yield the same feature")
    intercept[IllegalArgumentException](
      MediaDecoder.real.decode("not an image at all".getBytes("ISO-8859-1")))
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

  test("ImageIO lossless formats (PNG/TIFF/BMP-via-ImageIO) match Bmp bit-for-bit") {
    val (w, h) = (13, 9)
    val ref = Bmp.decodeStats(Bmp.encode24(w, h, pix))
    for (fmt <- Seq("png", "tiff", "bmp")) {
      val s = Multimodal.ImageIo.decodeStats(
        Multimodal.ImageIo.encode(w, h, fmt, pix))
      assert(s.width == w && s.height == h, fmt)
      // lossless: identical pixels → identical integer sums → identical
      // doubles, no tolerance needed
      assert(s.hueMean == ref.hueMean && s.hueStd == ref.hueStd, fmt)
      assert(s.satMean == ref.satMean && s.satStd == ref.satStd, fmt)
      assert(s.brightMean == ref.brightMean && s.brightStd == ref.brightStd, fmt)
      assert(s.entropy == ref.entropy, fmt)
    }
  }

  test("JPEG decodes through ImageIO: exact dims, streaming stats match a naive recompute") {
    val (w, h) = (24, 16)
    // smooth gradient: JPEG's DCT quantization stays close on it
    val smooth: (Int, Int) => (Int, Int, Int) =
      (x, y) => (40 + x * 4, 60 + y * 6, 90 + x * 2 + y * 2)
    val bytes = Multimodal.ImageIo.encode(w, h, "jpg", smooth)
    val img = Multimodal.ImageIo.decode(bytes)
    val s = Multimodal.ImageIo.statsOf(img)
    assert(s.width == w && s.height == h && s.colorspace == "RGB")
    // pin the streaming accumulator against a naive double-loop over the
    // SAME decoded raster
    val hsv = for (y <- 0 until h; x <- 0 until w) yield {
      val p = img.getRGB(x, y)
      Bmp.hsv255((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }
    def mean(f: ((Int, Int, Int)) => Int) = hsv.map(f(_).toDouble).sum / hsv.size
    assert(math.abs(s.hueMean - mean(_._1)) < 1e-9)
    assert(math.abs(s.satMean - mean(_._2)) < 1e-9)
    assert(math.abs(s.brightMean - mean(_._3)) < 1e-9)
    // lossy but close: decoded brightness near the source's on a gradient
    val srcBright = (for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = smooth(x, y); math.max(r, math.max(g, b)).toDouble
    }).sum / (w * h)
    assert(math.abs(s.brightMean - srcBright) < 8.0,
      s"JPEG brightness drifted: ${s.brightMean} vs $srcBright")
  }

  test("colorspace labels: grayscale L, alpha RGBA") {
    import java.awt.image.BufferedImage
    val g = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      g.setRGB(x, y, { val v = 40 + 10 * x; (v << 16) | (v << 8) | v })
    val gs = Multimodal.ImageIo.statsOf(g)
    assert(gs.colorspace == "L")
    assert(gs.satMean == 0.0, "gray pixels have zero saturation")
    val a = new BufferedImage(4, 4, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 4; x <- 0 until 4) a.setRGB(x, y, 0xff336699)
    assert(Multimodal.ImageIo.statsOf(a).colorspace == "RGBA")
  }

  test("syntheticImage(png) + withImageStats equals the BMP pipeline exactly") {
    val docs = table("documents").select("doc_id").limit(20)
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.withImageStats(df, "img").orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getDouble(r.fieldIndex("hue_mean")),
          r.getDouble(r.fieldIndex("sat_std")),
          r.getDouble(r.fieldIndex("bright_mean")),
          r.getDouble(r.fieldIndex("entropy")))).toSeq
    val viaBmp = run(Multimodal.syntheticBmp(docs, "doc_id"))
    val viaPng = run(Multimodal.syntheticImage(docs, "doc_id", "png"))
    assert(viaBmp == viaPng)
  }

  test("huge-image stddev does not overflow (PixelAcc BigInt variance)") {
    // 30M pixels of alternating 0/255 grayscale: the old Long-math
    // n·Σx²−(Σx)² overflows past ~12M pixels (an 8000×8000 photo is
    // reachable through ImageIo); exact variance is (255/2)² → std 127.5
    val acc = new Multimodal.PixelAcc
    var i = 0
    while (i < 30000000) {
      val v = if ((i & 1) == 0) 0 else 255
      acc.add(v, v, v); i += 1
    }
    val st = acc.result(6000, 5000, "RGB")
    assert(math.abs(st.brightMean - 127.5) < 1e-9 &&
      math.abs(st.brightStd - 127.5) < 1e-6,
      s"got ${st.brightMean} / ${st.brightStd}")
  }

  test("dHash: gradients saturate, codecs agree, orientation respected") {
    import Multimodal.DHash
    // strictly brighter to the right: every adjacent-cell comparison
    // fires -> all 64 bits set
    val right = Bmp.encode24(18, 16, (x, _) => (x * 14, x * 14, x * 14))
    assert(DHash.of(right) === -1L)
    // strictly dimmer to the right: no bit set
    val left = Bmp.encode24(18, 16, (x, _) => (250 - x * 14, 250 - x * 14, 250 - x * 14))
    assert(DHash.of(left) === 0L)
    // BMP (bottom-up storage) and PNG (top-down) must hash identically
    // for the same LOGICAL pixels — an orientation-sensitive feature,
    // unlike the mean/std stats
    val pngBytes = Multimodal.ImageIo.encode(18, 16, "png",
      (x, y) => ((x * 14 + y * 3) % 256, (x * 5 + y * 7) % 256, (x * 11 + y) % 256))
    val bmpBytes = Bmp.encode24(18, 16,
      (x, y) => ((x * 14 + y * 3) % 256, (x * 5 + y * 7) % 256, (x * 11 + y) % 256))
    assert(DHash.of(pngBytes) === DHash.of(bmpBytes))
    // a vertically-asymmetric image must differ from its flip (would
    // pass vacuously if decode ignored orientation)
    val top = Bmp.encode24(18, 16, (x, y) => if (y < 8) (250, 250, 250) else (x, x, x))
    val flip = Bmp.encode24(18, 16, (x, y) => if (y >= 8) (250, 250, 250) else (x, x, x))
    assert(DHash.of(top) !== DHash.of(flip))
    // a uniform +1 luminance shift (no channel wrap) cancels exactly in
    // the cross-multiplied mean comparisons: hamming 0
    val base = Bmp.encode24(18, 16, (x, y) => (x * 3, y * 2, (x + y) % 64))
    val lifted = Bmp.encode24(18, 16, (x, y) => (x * 3 + 1, y * 2, (x + y) % 64))
    assert(DHash.of(base) === DHash.of(lifted))
  }

  test("hashNearDups: pigeonhole-exhaustive at maxHamming < bands, verified vs brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val baseHashes = Seq.fill(40)(rng.nextLong())
    // plant near-dups: flip 1-7 bits of some bases
    val rows = baseHashes.zipWithIndex.flatMap { case (h, i) =>
      val planted =
        if (i % 3 == 0)
          Seq((i * 10L + 1, (1 to 1 + i % 7).foldLeft(h)((a, b) => a ^ (1L << (b * 5)))))
        else Seq.empty
      Seq((i * 10L, h)) ++ planted
    }
    val df = rows.toDF("id", "h")
    val got = graft.pipeline.Dedup.hashNearDups(df, "id", "h", maxHamming = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d)).toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture must plant at least one near pair")
  }

  test("resizeBmp24: identity preserves pixels; mapping is exact nearest-neighbor; orientation logical") {
    import Multimodal.resizeBmp24
    val src = Bmp.encode24(7, 5, (x, y) => (x * 30, y * 40, (x + y) * 10))
    // identity resize: every logical pixel survives byte-for-byte
    // (compare via dHash + stats, which read logical pixels)
    val id = resizeBmp24(src, 7, 5)
    assert(Multimodal.DHash.of(id) === Multimodal.DHash.of(src))
    // 1x1 resize picks source (0, 0) exactly
    val one = resizeBmp24(src, 1, 1)
    val st = Bmp.decodeStats(one)
    assert(st.width === 1 && st.height === 1)
    // upscale 2x then back down: dest (2x, 2y) samples source (x, y),
    // and the round trip picks every even dest pixel — the source must
    // reproduce exactly
    val back = resizeBmp24(resizeBmp24(src, 14, 10), 7, 5)
    assert(Multimodal.DHash.of(back) === Multimodal.DHash.of(src))
    // a vertically-asymmetric image resizes by LOGICAL rows: flipped
    // content must stay flipped after resize (the gradient half must
    // vary HORIZONTALLY — dHash only sees left-right comparisons)
    val top = Bmp.encode24(8, 8, (x, y) => if (y < 4) (x * 30, x * 30, x * 30) else (0, 0, 0))
    val flip = Bmp.encode24(8, 8, (x, y) => if (y >= 4) (x * 30, x * 30, x * 30) else (0, 0, 0))
    assert(Multimodal.DHash.of(resizeBmp24(top, 16, 16)) !==
      Multimodal.DHash.of(resizeBmp24(flip, 16, 16)))
  }

  test("hashNearDupsAgainstIndex: asymmetric pairs match brute force, ids from disjoint spaces") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val idx = (0L until 30L).map(i => (i, rng.nextLong()))
    // probes: some near an index hash (flip <= 5 bits), some random
    val prb = idx.take(10).zipWithIndex.map { case ((_, h), i) =>
      (1000L + i, (0 to i % 5).foldLeft(h)((a, b) => a ^ (1L << (b * 7))))
    } ++ (0 until 10).map(i => (2000L + i, rng.nextLong()))
    val got = graft.pipeline.Dedup.hashNearDupsAgainstIndex(
        prb.toDF("id", "h"), "id", "h", idx.toDF("id", "h"), "id", "h",
        maxHamming = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- prb; (b, hb) <- idx
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d)).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("hashNearDups: mega-buckets thin symmetrically — bounded sound pairs, never cap x bucket") {
    import spark.implicits._
    // 200 identical signatures: every band is one corpus-wide bucket
    val df = (0L until 200L).map(i => (i, 0x0123456789abcdefL)).toDF("id", "h")
    val got = graft.pipeline.Dedup
      .hashNearDups(df, "id", "h", maxHamming = 7, bands = 8, maxBucketSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // sound: all real pairs (hamming 0, a < b)
    assert(got.forall { case (a, b, d) => a < b && d === 0 })
    // bounded: the cap is EXPECTED-size sampling (binomial), so allow
    // ~2x the nominal 8 * C(20, 2) = 1520 — far below the uncapped
    // C(200, 2) = 19900 and the ~4000 a cap x bucket asymmetry emits
    assert(got.nonEmpty && got.length <= 3000,
      s"expected ~1520 (binomial) thinned pairs, got ${got.length}")
  }
}
