package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.ModelPerf

/** Calibration-bin semantics: hand-computed binning with clamped
  * out-of-range scores, exact shares, and partitioning invariance. */
class CalibrationSpec extends SparkSpec {

  test("hand binning: floor bins, edge clamping, exact counts and fractions") {
    import spark.implicits._
    val df = Seq(
      (0.1, true), (0.1, false), (0.6, true),
      (1.5, true),  // above hi -> last bin
      (-0.2, false) // below lo -> bin 0
    ).toDF("s", "y")
    val rows = ModelPerf.calibrationBins(df, F.col("s"), F.col("y"), bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      (0L, 0.0, 0.25, 3L, 1L, 1.0 / 3.0),
      (2L, 0.5, 0.75, 1L, 1L, 1.0),
      (3L, 0.75, 1.0, 1L, 1L, 1.0)))
  }

  test("boundary scores: exactly lo -> bin 0, exactly hi -> last bin") {
    import spark.implicits._
    val df = Seq((0.0, false), (1.0, true), (0.25, true)).toDF("s", "y")
    val bins = ModelPerf.calibrationBins(df, F.col("s"), F.col("y"), bins = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bins == Map(0L -> 1L, 1L -> 1L, 3L -> 1L)) // 0.25 lands in bin 1
  }

  test("result is partitioning-invariant over the real corpus logit") {
    import graft.pipeline.QualityClassifier
    val w = QualityClassifier.md5Weights(256)
    def scored(parts: Int) = table("documents").repartition(parts).select(
      QualityClassifier.logitOf(F.col("text"), w.toSeq, 0.0,
        QualityClassifier.featureMd5(_, 256)).as("logit"),
      (F.col("lang") === "en").as("y"))
    def rows(parts: Int) = ModelPerf.calibrationBins(
        scored(parts), F.col("logit"), F.col("y"), bins = 16, lo = -8.0, hi = 8.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val a = rows(1)
    val b = rows(7)
    assert(a == b && a.nonEmpty)
  }
}
