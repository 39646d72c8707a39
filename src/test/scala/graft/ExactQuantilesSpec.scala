package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.ExactQuantiles

/** Distributed exact quantiles vs Spark's buffer-everything percentile()
  * aggregate (bit-equality — same type-7 interpolation) and hand cases. */
class ExactQuantilesSpec extends SparkSpec {

  test("hand case: odd/even counts, ties, interpolation") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 2.0, 4.0, 10.0).toDF("x").repartition(3)
    val qs = ExactQuantiles.quantiles(df, Seq("x"), Seq(0.0, 0.5, 0.75, 1.0))("x")
    assert(qs == Seq(1.0, 2.0, 4.0, 10.0))
    val even = Seq(1.0, 3.0).toDF("x")
    assert(ExactQuantiles.quantiles(even, Seq("x"), Seq(0.5))("x") == Seq(2.0))
  }

  test("matches a local type-7 recomputation bit-for-bit; Spark percentile within 1 ulp") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val rows = Seq.fill(5000)((rng.nextInt(200).toDouble,
      rng.nextGaussian() * 100))
    val df = rows.toDF("a", "b").repartition(11)
    val ranks = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = ExactQuantiles.quantiles(df, Seq("a", "b"), ranks)
    // local reference: the (1−f)·v1 + f·v2 form DuckDB evaluates
    def local(xs: Seq[Double], r: Double): Double = {
      val s = xs.sorted; val h = r * (s.size - 1)
      val f = h - math.floor(h)
      (1.0 - f) * s(math.floor(h).toInt) + f * s(math.ceil(h).toInt)
    }
    val cols = Map("a" -> rows.map(_._1), "b" -> rows.map(_._2))
    for ((c, xs) <- cols; i <- ranks.indices)
      assert(got(c)(i) == local(xs, ranks(i)), s"$c rank ${ranks(i)}")
    // Spark's percentile() uses the (⌈h⌉−h)·v1 + (h−⌊h⌋)·v2 form — may
    // differ by 1 ulp but never more
    val exprs = Seq("a", "b").flatMap(c => ranks.map(r =>
      F.expr(s"percentile($c, ${r}D)")))
    val ref = df.agg(exprs.head, exprs.tail: _*).collect()(0)
    Seq("a", "b").zipWithIndex.foreach { case (c, ci) =>
      ranks.indices.foreach { i =>
        val e = ref.getDouble(ci * ranks.size + i)
        assert(math.abs(got(c)(i) - e) <= math.ulp(e), s"$c rank ${ranks(i)}")
      }
    }
  }

  test("nulls and NaNs are excluded; empty column yields empty") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0)).toDF("x")
    assert(ExactQuantiles.quantiles(df, Seq("x"), Seq(0.5))("x") == Seq(2.0))
    val empty = Seq.empty[Option[Double]].toDF("x")
    assert(ExactQuantiles.quantiles(empty, Seq("x"), Seq(0.5))("x").isEmpty)
  }

  test("single value column: every rank returns it") {
    import spark.implicits._
    val df = Seq.fill(7)(42.0).toDF("x").repartition(3)
    assert(ExactQuantiles.quantiles(df, Seq("x"), Seq(0.0, 0.3, 1.0))("x")
      == Seq(42.0, 42.0, 42.0))
  }

  test("iqrOutliers: hand case flags exactly the fence violations") {
    import spark.implicits._
    // {1..8} plus outliers -100, 100: q1 = 1+0.25*9=... use local check
    val vals = (1 to 8).map(_.toDouble) ++ Seq(-100.0, 100.0)
    val df = vals.toDF("x").repartition(3)
    val r = graft.analysis.Outliers.iqrOutliers(df, Seq("x")).collect()(0)
    val sorted = vals.sorted
    def q(p: Double) = {
      val h = p * (sorted.size - 1); val f = h - math.floor(h)
      (1 - f) * sorted(math.floor(h).toInt) + f * sorted(math.ceil(h).toInt)
    }
    val (q1, q3) = (q(0.25), q(0.75))
    assert(r.getAs[Double]("q1") == q1 && r.getAs[Double]("q3") == q3)
    val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_low") == vals.count(_ < lo))
    assert(r.getAs[Long]("n_high") == vals.count(_ > hi))
    assert(r.getAs[Long]("n_outliers") == 2L)
  }

  test("quantilesByKey: per-group medians match per-group local recomputation") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0),
      ("b", 5.0), ("b", 7.0), ("b", 9.0), ("b", 11.0),
      ("c", 3.0)).toDF("k", "v").repartition(4)
    val got = ExactQuantiles.quantilesByKey(df, F.col("k"), "v", Seq(0.25, 0.5))
    assert(got("a") == Seq(1.5, 2.0))
    assert(got("b") == Seq(6.5, 8.0))   // h=0.75 → 5 + 0.75·2; med (7+9)/2
    assert(got("c") == Seq(3.0, 3.0))
    assert(got.size == 3)
  }

  test("quantilesByKey: null keys and null values excluded; agrees with column-channel path") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), None),
      (None, Some(99.0)), (Some("a"), Some(3.0))).toDF("k", "v")
    val got = ExactQuantiles.quantilesByKey(df, F.col("k"), "v", Seq(0.5))
    assert(got == Map("a" -> Seq(2.0)))
    // the same numbers through the unkeyed path on the filtered slice
    val plain = ExactQuantiles.quantiles(
      df.where(F.col("k") === "a").select(F.col("v")), Seq("v"), Seq(0.5))
    assert(plain("v") == got("a"))
  }

  test("madOutliers: hand case — median, MAD, fences, counts") {
    import spark.implicits._
    // {1..9} ∪ {1000}: med = 5.5, |v−med| sorted = {0.5,0.5,1.5,1.5,2.5,
    // 2.5,3.5,3.5,4.5,994.5} → mad = 2.5
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val df = vals.toDF("x").repartition(3)
    val r = graft.analysis.Outliers.madOutliers(df, Seq("x")).collect()(0)
    assert(r.getAs[Double]("med") == 5.5)
    assert(r.getAs[Double]("mad") == 2.5)
    val lo = 5.5 - 3.0 * (1.4826 * 2.5)
    val hi = 5.5 + 3.0 * (1.4826 * 2.5)
    assert(r.getAs[Double]("lo_fence") == lo)
    assert(r.getAs[Double]("hi_fence") == hi)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_low") == 0L)
    assert(r.getAs[Long]("n_high") == 1L)   // only 1000
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("madOutliers/iqrOutliers: NaN rows count in n and land in n_high " +
    "(Spark orders NaN above all values), but stay out of med/MAD — " +
    "the single-scan path pins the old per-row semantics") {
    import spark.implicits._
    // count(v) counts NaN (non-null); Spark SQL comparison semantics put
    // NaN GREATER than every value, so per-row `v > hi` was true for NaN
    // and the weighted path must reproduce that; quantile machinery
    // excludes NaN — exactly the three-scan behavior
    val vals = (1 to 9).map(_.toDouble) ++ Seq(1000.0, Double.NaN, Double.NaN)
    val df = vals.toDF("x").repartition(3)
    val m = graft.analysis.Outliers.madOutliers(df, Seq("x")).collect()(0)
    assert(m.getAs[Double]("med") == 5.5)
    assert(m.getAs[Double]("mad") == 2.5)
    assert(m.getAs[Long]("n") == 12L)          // NaNs counted
    assert(m.getAs[Long]("n_high") == 3L)      // 1000 + both NaNs
    assert(m.getAs[Long]("n_outliers") == 3L)
    val i = graft.analysis.Outliers.iqrOutliers(df, Seq("x")).collect()(0)
    assert(i.getAs[Long]("n") == 12L)
    assert(i.getAs[Long]("n_high") == 3L)
  }

  test("madOutliers: constant column has mad 0 and flags nothing") {
    import spark.implicits._
    val df = Seq.fill(5)(7.0).toDF("x")
    val r = graft.analysis.Outliers.madOutliers(df, Seq("x")).collect()(0)
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 0L)
  }

  test("winsorize: hand cuts, clip counts, and fold-order-free sums") {
    import spark.implicits._
    // 1..10 at [0.1, 0.9]: type-7 h = 0.1*9 = 0.9 -> lo = 1.9; hi = 9.1
    val df = (1 to 10).map(_.toDouble).toDF("x").repartition(4)
    val r = graft.analysis.Outliers.winsorize(df, "x", 0.1, 0.9).collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(math.abs(r.getAs[Double]("lo_cut") - 1.9) < 1e-12)
    assert(math.abs(r.getAs[Double]("hi_cut") - 9.1) < 1e-12)
    assert(r.getAs[Long]("n_clipped_lo") == 1L)  // the 1
    assert(r.getAs[Long]("n_clipped_hi") == 1L)  // the 10
    assert(r.getAs[Double]("sum_raw") == 55.0)
    // 55 - (1 -> 1.9) - (10 -> 9.1) = 55 + 0.9 - 0.9 = 55
    assert(r.getAs[Double]("sum_wins") == 55.0)
    // NULL/NaN excluded
    val withNull = (Seq(Some(1.0), None, Some(Double.NaN)) ++
      (2 to 10).map(d => Some(d.toDouble))).toDF("x")
    val r2 = graft.analysis.Outliers.winsorize(withNull, "x", 0.1, 0.9).collect()(0)
    assert(r2.getAs[Long]("n") == 10L)
    // invariance under repartition
    val a = graft.analysis.Outliers.winsorize(table("lineitem"), "l_quantity")
      .collect()(0)
    val b = graft.analysis.Outliers.winsorize(
      table("lineitem").repartition(13), "l_quantity").collect()(0)
    assert(a.toSeq == b.toSeq)
  }
}
