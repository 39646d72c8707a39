package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Streaming drift monitor: envelope freezing, edge-bin clamping, the
  * missing-bin eps floor, and streamed-equals-batch parity on the real
  * events table. */
class DriftStreamSpec extends SparkSpec {

  private def eventsBatch = eventsDF

  test("referenceEnvelope: counts, bounds, and the degenerate width") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0).toDF("v")
    val env = DriftStream.referenceEnvelope(df, "v", nBins = 4)
    assert(env.lo == 0.0 && env.width == 1.0 && env.nRef == 5L)
    // 4.0 clamps into the last bin: [1, 1, 1, 2]
    assert(env.refCounts.toSeq == Seq(1L, 1L, 1L, 2L))
    val point = Seq(7.0, 7.0).toDF("v")
    val pe = DriftStream.referenceEnvelope(point, "v", nBins = 3)
    assert(pe.width == 1.0 && pe.refCounts.toSeq == Seq(2L, 0L, 0L))
  }

  test("psiPerWindow: out-of-envelope live values clamp into edge bins and score") {
    import spark.implicits._
    val ref = Seq(0.0, 1.0, 2.0, 3.0).toDF("v")
    val env = DriftStream.referenceEnvelope(ref, "v", nBins = 2)
    // live data far outside the envelope on both sides: all mass clamps
    // to bins 0 and 1 rather than disappearing
    val live = Seq(("2024-01-01 00:00:00", -100.0), ("2024-01-01 01:00:00", 999.0))
      .toDF("t", "value").withColumn("ts", F.col("t").cast("timestamp"))
    val got = DriftStream.monitor(live, "ts", "1 day", "value", env).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_target") == 2L)
    // p = (.5,.5) vs q = (.5,.5): clamped mass matches the ref split ⇒ 0
    assert(math.abs(got(0).getAs[Double]("psi")) < 1e-15)
  }

  test("psiPerWindow: a bin with mass on only one side still contributes via eps") {
    import spark.implicits._
    val ref = (Seq.fill(50)(0.5) ++ Seq.fill(50)(1.5)).toDF("v")
    val env = DriftStream.referenceEnvelope(ref, "v", nBins = 2)
    // live mass entirely in bin 0: pa=(1,eps), pb=(.5,.5)
    val live = Seq.fill(10)(("2024-01-01 00:00:00", 0.5))
      .toDF("t", "value").withColumn("ts", F.col("t").cast("timestamp"))
    val got = DriftStream.monitor(live, "ts", "1 day", "value", env).collect()
    val eps = 1e-4
    val expected = (1.0 - 0.5) * math.log(1.0 / 0.5) +
      (eps - 0.5) * math.log(eps / 0.5)
    assert(math.abs(got(0).getAs[Double]("psi") - expected) < 1e-15)
  }

  test("jsdPerWindow: zero on matching proportions, bounded, one-sided bins finite") {
    import spark.implicits._
    val ref = (Seq.fill(50)(0.5) ++ Seq.fill(50)(1.5)).toDF("v")
    val env = DriftStream.referenceEnvelope(ref, "v", nBins = 2)
    def live(vals: Seq[Double]) = vals.map(("2024-01-01 00:00:00", _))
      .toDF("t", "value").withColumn("ts", F.col("t").cast("timestamp"))
    def jsdOf(vals: Seq[Double]): Double = DriftStream.jsdPerWindow(
      DriftStream.windowedBinCounts(live(vals), "ts", "1 day", "value", env), env)
      .collect()(0).getAs[Double]("jsd")
    // live matches the 50/50 reference split -> 0
    assert(math.abs(jsdOf(Seq(0.5, 1.5))) < 1e-9)
    // all live mass in bin 0 (ref has half there): hand-computed
    // m = (1 + .5)/2 = .75 for bin0; bin1: pa=0, pb=.5, m=.25
    val expected = 0.5 * (1.0 * math.log(1.0 / 0.75)) +
      0.5 * (0.5 * math.log(0.5 / 0.75)) + 0.5 * (0.5 * math.log(0.5 / 0.25))
    val oneSided = jsdOf(Seq.fill(10)(0.5))
    assert(math.abs(oneSided - expected) < 1e-8, s"got $oneSided want $expected")
    assert(oneSided > 0 && oneSided <= math.log(2.0) + 1e-12)
  }

  test("emdPerWindow: zero on matching proportions, hand-computed shift, bounded") {
    import spark.implicits._
    val ref = (Seq.fill(50)(0.5) ++ Seq.fill(50)(1.5)).toDF("v")
    val env = DriftStream.referenceEnvelope(ref, "v", nBins = 2)
    def live(vals: Seq[Double]) = vals.map(("2024-01-01 00:00:00", _))
      .toDF("t", "value").withColumn("ts", F.col("t").cast("timestamp"))
    def emdOf(vals: Seq[Double]): Double = DriftStream.emdPerWindow(
      DriftStream.windowedBinCounts(live(vals), "ts", "1 day", "value", env), env)
      .collect()(0).getAs[Double]("emd")
    assert(emdOf(Seq(0.5, 1.5)) === 0.0)
    // all live mass in bin 0 vs the 50/50 ref: cdf gaps are (.5, 0)
    // over 2 bins -> (0.5 + 0) / 2 = 0.25
    assert(emdOf(Seq.fill(10)(0.5)) === 0.25)
    // all mass in bin 1: gap only at bin 0 -> 0.25 as well (symmetry)
    assert(emdOf(Seq.fill(4)(1.5)) === 0.25)
  }

  test("streamed windowed bin counts equal the batch computation on real events") {
    val batch = eventsBatch
    val env = DriftStream.referenceEnvelope(
      batch.filter(F.col("ts") < F.lit("2024-01-11").cast("timestamp")),
      "value", nBins = 30)
    val sdf = graft.api.StandardQueries.rebuildTs(spark.readStream
      .schema(table("events").schema)
      .parquet(graft.api.StandardQueries.streamableDir(s"$sfDir/events.parquet")))
    val qn = "sds_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = DriftStream.windowedBinCounts(sdf, "ts", "1 day", "value", env)
      .writeStream.format("memory").queryName(qn).outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = DriftStream.psiPerWindow(spark.table(qn), env)
      .select(F.col("window.start").as("w"), F.col("psi"), F.col("n_target"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2))).toSet
    val direct = DriftStream.monitor(batch, "ts", "1 day", "value", env)
      .select(F.col("window.start").as("w"), F.col("psi"), F.col("n_target"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == direct)
  }
}
