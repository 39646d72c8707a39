package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.pipeline.Video.Avi

/** Real uncompressed-AVI decode path: RIFF container round-trip,
  * per-frame DIB hashing, loud failures, Spark operators. */
class VideoSpec extends SparkSpec {

  test("encode/parse round-trip: geometry, timing, frame count, frame order") {
    val avi = Avi.encode(10, 6, 4, 40000,
      (f, x, y) => ((f * 50 + x) % 256, (y * 10) % 256, 7))
    val m = Avi.metaOf(avi)
    assert(m.width === 10 && m.height === 6 && m.nFrames === 4)
    assert(m.usPerFrame === 40000 && m.durationMs === 160L)
    val hashes = Avi.frameDHashes(avi)
    assert(hashes.length === 4)
    // frames differ (the f term moves the luminance gradient) and come
    // back in order: frame f must equal the same frame encoded alone
    // as a single-frame video
    (0 until 4).foreach { f =>
      val single = Avi.encode(10, 6, 1, 40000,
        (_, x, y) => ((f * 50 + x) % 256, (y * 10) % 256, 7))
      assert(Avi.frameDHashes(single)(0) === hashes(f), s"frame $f")
    }
  }

  test("frame pixels match the BMP path: same image -> same dHash") {
    val pix: (Int, Int) => (Int, Int, Int) =
      (x, y) => ((x * 29 + y * 3) % 256, (x * 5 + y * 13) % 256, (x + y * 7) % 256)
    val avi = Avi.encode(14, 9, 1, 33333, (_, x, y) => pix(x, y))
    val bmp = Multimodal.Bmp.encode24(14, 9, pix)
    assert(Avi.frameDHashes(avi)(0) === Multimodal.DHash.of(bmp))
  }

  test("loud failures: truncation, compressed chunks, frame-count mismatch") {
    val avi = Avi.encode(8, 8, 2, 33333, (f, x, y) => (f, x, y))
    assertThrows[IllegalArgumentException](Avi.metaOf(avi.dropRight(3)))
    // flip a frame chunk id to the compressed '00dc'
    val dc = avi.clone()
    val idx = indexOfTag(dc, "00db")
    dc(idx + 3) = 'c'
    assertThrows[IllegalArgumentException](Avi.frameDHashes(dc))
    // declare 3 frames but carry 2
    val lying = avi.clone()
    val avih = indexOfTag(lying, "avih")
    lying(avih + 8 + 16) = 3 // totalFrames field
    assertThrows[IllegalArgumentException](Avi.frameDHashes(lying))
  }

  private def indexOfTag(a: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    (0 until a.length - 4).find(i =>
      a(i) == t(0) && a(i + 1) == t(1) && a(i + 2) == t(2) && a(i + 3) == t(3)).get
  }

  test("spark operators: meta + frame hashes over the synthetic fixture, null passthrough") {
    import spark.implicits._
    val base = Seq(0L, 5L).toDF("base")
    val avis = Video.syntheticAvi(base, "base")
    val meta = Video.withVideoMeta(avis, "avi")
      .select("base", "video.width", "video.height", "video.n_frames")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(meta(0L) === ((8, 8, 3)))
    assert(meta(5L) === ((13, 13, 4)))
    val fh = Video.withFrameDHashes(avis, "avi")
      .select("base", "frame_dhashes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fh(0L).length === 3 && fh(5L).length === 4)
    assert(fh(5L).distinct.length === 4, "frames must differ")
    val withNull = avis.withColumn("avi",
      F.when(F.col("base") === 5L, F.lit(null)).otherwise(F.col("avi")))
    val ns = Video.withVideoMeta(withNull, "avi")
      .filter(F.col("base") === 5L).select("video").collect()
    assert(ns.length === 1 && ns(0).isNullAt(0))
  }
}
