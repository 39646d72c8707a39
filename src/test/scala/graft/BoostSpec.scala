package graft

import graft.analysis.{Boost, TreeSplit}
import graft.analysis.TreeSplit.FeatureSpec
import org.apache.spark.sql.{functions => F}

class BoostSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed run: base, split, floor leaves, exact SSE trajectory") {
    // y = 10,10,20,20 over x = 1,1,2,2: base m0 = 15, r = -5,-5,5,5
    // round 1: split x<=1 (only candidate): SL=-10 nL=2 -> lv=-5; rv=5
    //   residuals all 0, sse=0; round 2: histogram all-zero sums ->
    //   best split score 0, leaves 0, sse stays 0
    val df = Seq((1, 10), (1, 10), (2, 20), (2, 20)).toDF("x", "y")
    val got = Boost.lsBoost(df, "y", Seq(FeatureSpec("x", F.col("x"))), rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(7)))
    assert(got(0) == ((0L, "__base", -1L, 15L, 15L, 100L))) // sse0 = 4*25
    assert(got(1) == ((1L, "x", 1L, -5L, 5L, 0L)))
    assert(got(2) == ((2L, "x", 1L, 0L, 0L, 0L)))
  }

  test("floor leaves keep residuals integral; SSE never increases") {
    val df = Seq((1, 7), (1, 8), (2, 31), (2, 33), (3, 100)).toDF("x", "y")
    val rows = Boost.lsBoost(df, "y", Seq(FeatureSpec("x", F.col("x"))), rounds = 3)
      .collect().map(r => r.getLong(7))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"SSE increased: ${rows.toSeq}") }
  }

  test("result is partitioning-invariant (integer residuals)") {
    val li = table("lineitem")
    val feats = Seq(
      FeatureSpec("d", F.round(F.col("l_discount") * 100)),
      FeatureSpec("t", F.round(F.col("l_tax") * 100)))
    val a = Boost.lsBoost(li, "l_quantity", feats, 2).collect().toSeq
    val b = Boost.lsBoost(li.repartition(17), "l_quantity", feats, 2).collect().toSeq
    assert(a == b && a.length == 3)
  }

  test("predictColumn: re-applied model equals target minus final residual") {
    val li = table("lineitem").filter(F.col("l_orderkey") < 2000)
    val feats = Seq(
      FeatureSpec("d", F.round(F.col("l_discount") * 100)),
      FeatureSpec("t", F.round(F.col("l_tax") * 100)))
    val m = Boost.lsBoostModel(li, "l_quantity", feats, 2)
    assert(m.stumps.length == 2)
    // independent check: SSE of (y - pred) must equal the trace's last SSE
    val trace = Boost.lsBoost(li, "l_quantity", feats, 2).collect()
    val lastSse = trace.last.getLong(7)
    val resid = li.select((F.col("l_quantity").cast("long") -
        Boost.predictColumn(m, feats)).as("r"))
      .agg(F.sum(F.col("r") * F.col("r"))).head.getLong(0)
    assert(resid == lastSse)
  }

  test("single-bin features stop training early instead of dividing by zero") {
    val df = Seq((1, 5), (1, 9)).toDF("x", "y")
    val got = Boost.lsBoost(df, "y", Seq(FeatureSpec("x", F.col("x"))), rounds = 3)
      .collect()
    assert(got.length == 1 && got.head.getString(1) == "__base")
  }

  test("NULL targets are dropped (complete-case), not counted into the base") {
    // with the NULL row counted, n=3 dilutes m0 to floor(20/3)=6;
    // complete-case gives m0 = 10 and the run equals the clean frame's
    val dirty = Seq((1, Some(8)), (2, Some(12)), (3, None))
      .toDF("x", "y")
    val clean = Seq((1, 8), (2, 12)).toDF("x", "y")
    val a = Boost.lsBoost(dirty, "y", Seq(FeatureSpec("x", F.col("x"))), rounds = 2)
      .collect().toSeq
    val b = Boost.lsBoost(clean, "y", Seq(FeatureSpec("x", F.col("x"))), rounds = 2)
      .collect().toSeq
    assert(a == b)
    assert(a.head.getLong(3) == 10L) // base = floor(20/2), not floor(20/3)
  }
}
