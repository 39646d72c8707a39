package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.{ExactQuantiles, FeatureEncoding}

/** Feature-prep operators: exact quantile binning and smoothed target
  * encoding — hand-computed values, exactness under repartitioning. */
class FeaturePrepSpec extends SparkSpec {

  test("quantileBins: hand quartiles of 1..8 (type-7 cuts at 2.75/4.5/6.25)") {
    import spark.implicits._
    val df = (1 to 8).map(_.toDouble).toDF("v").repartition(3)
    val got = ExactQuantiles.quantileBins(df, "v").orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (0, 2L, 1.0, 2.0), (1, 2L, 3.0, 4.0), (2, 2L, 5.0, 6.0), (3, 2L, 7.0, 8.0)))
  }

  test("quantileBins: nulls and NaNs excluded; custom ranks") {
    import spark.implicits._
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0),
      None, Some(Double.NaN)).toDF("v")
    val got = ExactQuantiles.quantileBins(df, "v", Seq(0.5)).orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((0, 2L), (1, 2L))) // median 2.5 splits evenly
  }

  test("targetEncode: hand smoothing toward the global prior") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)).toDF("c", "y")
    val got = FeatureEncoding.targetEncode(df, "c", "y", smoothing = 10.0)
      .orderBy("category").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val prior = 16.0 / 4.0
    assert(got == Seq(
      ("a", 3L, (6.0 + 10.0 * prior) / (3.0 + 10.0)),
      ("b", 1L, (10.0 + 10.0 * prior) / (1.0 + 10.0))))
  }

  test("targetEncode: zero smoothing is the plain category mean; invariant to partitioning") {
    import spark.implicits._
    val df = Seq(("a", 1.5), ("a", 2.5), ("b", 7.0)).toDF("c", "y")
    val got = FeatureEncoding.targetEncode(df.repartition(5), "c", "y", smoothing = 0.0)
      .orderBy("category").collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 2.0), ("b", 7.0)))
    val a = FeatureEncoding.targetEncode(eventsDF.coalesce(1), "event_type", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val b = FeatureEncoding.targetEncode(eventsDF.repartition(7), "event_type", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }
}
