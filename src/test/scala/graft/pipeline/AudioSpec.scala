package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.pipeline.Audio.Wav

/** Real PCM WAV decode path: RIFF chunk walking, exact one-pass stats,
  * energy fingerprint properties, and the Spark operators over it. */
class AudioSpec extends SparkSpec {

  test("stats: hand-computed tiny stereo fixture") {
    // 4 frames, 2 channels: L = [100, -200, 0, 300], R = [-50, 50, -32768, 32767]
    val l = Array(100, -200, 0, 300)
    val r = Array(-50, 50, -32768, 32767)
    val wav = Wav.encodePcm16(2, 8000, 4,
      (i, ch) => if (ch == 0) l(i) else r(i))
    val s = Wav.statsOf(wav, silenceThreshold = 256)
    assert(s.nFrames === 4L)
    assert(s.channels === 2)
    assert(s.sampleRate === 8000)
    assert(s.durationMs === 0L) // 4 * 1000 / 8000 = 0 by integer division
    assert(s.peak === 32768) // full-scale negative
    assert(s.sumSq === (100L * 100 + 200L * 200 + 0 + 300L * 300 +
      50L * 50 + 50L * 50 + 32768L * 32768 + 32767L * 32767))
    // L transitions at 100->-200 and -200->0 (0 counts as non-negative);
    // R at -50->50, 50->-32768, -32768->32767
    assert(s.zeroCrossings === 5L)
    assert(s.clipped === 2L)
    // frame maxima: 100, 200, 32768, 32767 -> first/last loud = 2/3
    assert(s.leadSilence === 2L)
    assert(s.trailSilence === 0L)
    assert(s.rms === math.sqrt(s.sumSq.toDouble / 8.0))
  }

  test("stats: all-silent audio has full lead and trail silence") {
    val wav = Wav.encodePcm16(1, 16000, 10, (_, _) => 3)
    val s = Wav.statsOf(wav, silenceThreshold = 256)
    assert(s.leadSilence === 10L && s.trailSilence === 10L)
    assert(s.peak === 3 && s.zeroCrossings === 0L && s.clipped === 0L)
  }

  test("parse: skips unknown chunks and honors odd-size padding") {
    val base = Wav.encodePcm16(1, 8000, 3, (i, _) => i * 100)
    // splice a 3-byte (odd -> 1 pad byte) LIST chunk between fmt and data
    val fmtEnd = 36 // header(12) + fmt(8+16)
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(fmtEnd) ++ junk ++ base.drop(fmtEnd)
    val s = Wav.statsOf(spliced)
    assert(s.nFrames === 3L && s.peak === 200)
    // truncated chunk must fail loudly, not read junk
    assertThrows[IllegalArgumentException] {
      Wav.statsOf(base.dropRight(2))
    }
    // non-PCM format code refused
    val nonPcm = base.clone()
    nonPcm(20) = 3 // IEEE float format tag
    assertThrows[IllegalArgumentException](Wav.statsOf(nonPcm))
  }

  test("fingerprint: gradients saturate, gain-invariant, channels pooled") {
    // strictly rising |amplitude| per window -> every comparison fires
    val rising = Wav.encodePcm16(1, 8000, 650, (i, _) => i * 50)
    assert(Wav.fingerprint(rising) === -1L)
    val falling = Wav.encodePcm16(1, 8000, 650, (i, _) => 32500 - i * 50)
    assert(Wav.fingerprint(falling) === 0L)
    // uniform small gain preserves every strict energy inequality
    val a = Wav.encodePcm16(1, 8000, 500,
      (i, _) => ((i * 7919) % 2001) - 1000)
    val a2 = Wav.encodePcm16(1, 8000, 500,
      (i, _) => (((i * 7919) % 2001) - 1000) * 2)
    assert(Wav.fingerprint(a) === Wav.fingerprint(a2))
    // a mono signal and its L/R duplication pool to the same comparisons
    val stereo = Wav.encodePcm16(2, 8000, 500,
      (i, _) => ((i * 7919) % 2001) - 1000)
    assert(Wav.fingerprint(stereo) === Wav.fingerprint(a))
  }

  test("LIST/INFO metadata: round-trip, odd-length padding, stats unaffected, absent tags NULL") {
    val plain = Wav.encodePcm16(1, 8000, 5, (i, _) => i * 100)
    assert(Wav.info(plain) === Map.empty)
    // odd-length value ("abc" + NUL = 4... use "abcd" + NUL = 5 -> padded)
    val tagged = Wav.encodePcm16WithInfo(1, 8000, 5, (i, _) => i * 100,
      Seq("INAM" -> "abcd", "IART" -> "x"))
    assert(Wav.info(tagged) === Map("INAM" -> "abcd", "IART" -> "x"))
    // the spliced LIST chunk must not disturb parse/stats
    assert(Wav.statsOf(tagged) === Wav.statsOf(plain))
    // absent keys come back NULL through the operator
    import spark.implicits._
    val df = Audio.withAudioInfo(
      Seq(0L, 8L).toDF("base").transform(d => Audio.syntheticWavTagged(d, "base")),
      "wav", Seq("INAM", "IGNR"))
    val rows = df.select("base", "inam", "ignr").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.isNullAt(2)))).toMap
    assert(rows(0L) === (("track 0", true)))
    assert(rows(8L) === (("track 8", true)))
  }

  test("spark operators: stats + fingerprint over the synthetic fixture, null passthrough") {
    import spark.implicits._
    val base = Seq(0L, 1L, 2L, 41L).toDF("base")
      .withColumn("shift", F.lit(0))
    val wavs = Audio.syntheticWav(base, "base", "shift")
    val stats = Audio.withAudioStats(wavs, "wav")
      .select("base", "audio.n_frames", "audio.channels", "audio.sample_rate",
        "audio.lead_silence", "audio.peak")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5))).toMap
    assert(stats(0L) === ((300L, 1, 8000, 0L, 32767))) // spike at i=0 (0 % 97 == 0)
    assert(stats(1L) === ((301L, 2, 16000, 1L, 32767))) // lead0 = 1
    assert(stats(41L)._4 === 4L) // lead0 = 41 % 37
    val fps = Audio.withFingerprint(wavs, "wav").select("base", "afp").collect()
    assert(fps.length === 4 && fps.map(_.getLong(1)).distinct.length === 4)
    // null binary -> null struct / null hash
    val withNull = wavs.withColumn("wav",
      F.when(F.col("base") === 2L, F.lit(null)).otherwise(F.col("wav")))
    val ns = Audio.withAudioStats(withNull, "wav")
      .filter(F.col("base") === 2L).select("audio").collect()
    assert(ns.length === 1 && ns(0).isNullAt(0))
    val nf = Audio.withFingerprint(withNull, "wav")
      .filter(F.col("base") === 2L).select("afp").collect()
    assert(nf.length === 1 && nf(0).isNullAt(0))
  }

  test("variant fixture is a near-duplicate: small nonzero hamming to its base") {
    import spark.implicits._
    val rows = (0L until 40L).flatMap(b => Seq((b, 0), (b, 1)))
      .toDF("base", "shift")
    val fp = Audio.withFingerprint(
        Audio.syntheticWav(rows, "base", "shift"), "wav")
      .select("base", "shift", "afp").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hams = (0L until 40L).map(b =>
      java.lang.Long.bitCount(fp((b, 0)) ^ fp((b, 1))))
    assert(hams.max <= 12, s"variants drifted too far: $hams")
    // unrelated fingerprints stay far apart on average
    val cross = for (a <- 0L until 10L; b <- 10L until 20L)
      yield java.lang.Long.bitCount(fp((a, 0)) ^ fp((b, 0)))
    assert(cross.sum.toDouble / cross.size > 20.0)
  }
}
