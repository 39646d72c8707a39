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

  test("robustScaleStats: hand median/IQR of 1..9; zero IQR scales to 0") {
    import spark.implicits._
    val df = (1 to 9).map(_.toDouble).toDF("v")
    val r = FeatureEncoding.robustScaleStats(df, "v").collect().head
    // quartiles of 1..9 (type-7): q1=3, med=5, q3=7 -> iqr=4
    assert((r.getDouble(0), r.getDouble(1), r.getLong(2)) == ((5.0, 4.0, 9L)))
    assert((r.getDouble(3), r.getDouble(4)) == ((-1.0, 1.0)))
    val const = Seq(2.0, 2.0, 2.0).toDF("v")
    val c = FeatureEncoding.robustScaleStats(const, "v").collect().head
    assert(c.getDouble(1) == 0.0 && c.getDouble(3) == 0.0 && c.getDouble(4) == 0.0)
  }

  test("joinCardinality: exact fan-out without running the join") {
    import spark.implicits._
    val left = Seq("a", "a", "a", "b", "c").toDF("k")   // a:3, b:1, c:1
    val right = Seq("a", "a", "b", "d").toDF("k")       // a:2, b:1, d:1
    val r = graft.analysis.DataAudit.joinCardinality(left, right, "k", "k")
      .collect().head
    // out = 3*2 + 1*1 = 7; worst key a contributes 6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getString(5)) == ((7L, 5L, 4L, 2L, 6L, "a")))
    // the audit's prediction equals the actual join size
    assert(left.join(right, Seq("k")).count() == 7L)
    // disjoint keys -> zero output, null worst key
    val z = graft.analysis.DataAudit.joinCardinality(
      left, Seq("x").toDF("k"), "k", "k").collect().head
    assert(z.getLong(0) == 0L && z.getLong(3) == 0L && z.isNullAt(4))
  }

  test("percentRanks: hand values with ties; no unpartitioned window in the plan") {
    import spark.implicits._
    // values 1,2,2,3 (n=4): below = 0,1,1,3 -> pct 0, 1/3, 1/3, 1
    val df = Seq(1.0, 2.0, 2.0, 3.0).toDF("v").repartition(3)
    val got = ExactQuantiles.percentRanks(df, "v").orderBy("value").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1.0, 0L, 0.0), (2.0, 1L, 1.0 / 3.0), (3.0, 3L, 1.0)))
    // single value: denominator clamps, rank 0
    val one = ExactQuantiles.percentRanks(Seq(5.0, 5.0).toDF("v"), "v").collect()
    assert(one.map(r => (r.getLong(1), r.getDouble(2))).toSeq == Seq((0L, 0.0)))
    // scale pin: every window is partitioned (no single-task global sort)
    val out = ExactQuantiles.percentRanks(table("lineitem"), "l_quantity")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.trim.startsWith("Window ")).toSeq
    assert(windows.forall(_.contains("__pid")),
      s"unpartitioned window found:\n${windows.mkString("\n")}")
  }

  test("percentRanksMulti: one batched pass equals per-column calls; one range exchange") {
    import spark.implicits._
    val li = table("lineitem")
    val multi = ExactQuantiles.percentRanksMulti(li, Seq("l_quantity", "l_discount"))
    val rows = multi.collect()
    for (c <- Seq("l_quantity", "l_discount")) {
      val single = ExactQuantiles.percentRanks(li, c).collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSet
      val sliced = rows.filter(_.getString(0) == c)
        .map(r => (r.getDouble(1), r.getLong(3), r.getDouble(4))).toSet
      assert(sliced == single && single.nonEmpty)
    }
    // scale pin: every window is partitioned (no single-task global
    // sort). The single range exchange lives behind the localCheckpoint
    // (ExistingRDD here); its shape is pinned by the shared quantiles
    // machinery this reuses.
    val plan = multi.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("__pid")),
      s"unpartitioned window found:\n${windows.mkString("\n")}")
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
