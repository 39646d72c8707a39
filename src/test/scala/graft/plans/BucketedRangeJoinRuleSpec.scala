package graft.plans

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** The opt-in optimizer rewrite: naive BETWEEN range joins become the
  * bucketed equi-join, results stay identical, and the rule declines
  * everything outside its conservative pattern. */
class BucketedRangeJoinRuleSpec extends SparkSpec {

  private def withRule[A](width: Long)(body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketedRangeJoinRule
    spark.conf.set(BucketedRangeJoinRule.WidthKey, width.toString)
    try body finally {
      spark.conf.unset(BucketedRangeJoinRule.WidthKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  import org.apache.spark.sql.DataFrame
  private def fixtures: (DataFrame, DataFrame) = {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val points = Seq.fill(300)((rng.nextInt(4).toLong,
      rng.nextInt(1000).toLong, rng.nextLong())).toDF("k", "t", "pid")
    val intervals = Seq.fill(40) {
      val lo = rng.nextInt(1000).toLong
      (rng.nextInt(4).toLong, lo, lo + rng.nextInt(150).toLong, rng.nextLong())
    }.toDF("k2", "lo", "hi", "iid")
    (points, intervals)
  }

  private def naiveJoin(points: DataFrame, intervals: DataFrame) =
    points.join(intervals,
      F.col("k") === F.col("k2") &&
        F.col("t") >= F.col("lo") && F.col("t") <= F.col("hi"))
      .select("pid", "iid")

  test("rewrite preserves results exactly and plans the bucketed equi-join") {
    val (points, intervals) = fixtures
    val expected = naiveJoin(points, intervals)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    withRule(100L) {
      val df = naiveJoin(points, intervals)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expected)
      assert(got.length == got.distinct.length, "rewrite introduced duplicates")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__rj_b"), s"rule did not fire:\n$plan")
      assert(plan.toLowerCase.contains("explode"),
        s"interval side not bucket-exploded:\n$plan")
    }
  }

  test("declines: no equi key, outer join, non-integral bounds, width unset") {
    val (points, intervals) = fixtures
    // width unset → rule inert even when registered
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketedRangeJoinRule
    try {
      val p0 = naiveJoin(points, intervals).queryExecution.optimizedPlan.toString
      assert(!p0.contains("__rj_b"))
    } finally spark.experimental.extraOptimizations = prev
    withRule(100L) {
      // no equi-key conjunct: pure range join stays untouched
      val noKey = points.join(intervals,
        F.col("t") >= F.col("lo") && F.col("t") <= F.col("hi"))
      assert(!noKey.queryExecution.optimizedPlan.toString.contains("__rj_b"))
      // outer join stays untouched
      val outer = points.join(intervals,
        F.col("k") === F.col("k2") &&
          F.col("t") >= F.col("lo") && F.col("t") <= F.col("hi"), "left")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("__rj_b"))
      // double-typed bounds stay untouched
      val d = points.withColumn("td", F.col("t").cast("double"))
      val dbl = d.join(intervals,
        F.col("k") === F.col("k2") &&
          F.col("td") >= F.col("lo").cast("double") &&
          F.col("td") <= F.col("hi").cast("double"))
      assert(!dbl.queryExecution.optimizedPlan.toString.contains("__rj_b"))
    }
  }

  test("SQL surface: a BETWEEN join through spark.sql rewrites too") {
    val (points, intervals) = fixtures
    points.createOrReplaceTempView("rj_points")
    intervals.createOrReplaceTempView("rj_intervals")
    try withRule(64L) {
      val df = spark.sql(
        """SELECT pid, iid FROM rj_points p JOIN rj_intervals i
          | ON p.k = i.k2 AND p.t BETWEEN i.lo AND i.hi""".stripMargin)
      val expected = naiveJoin(points, intervals)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expected)
      assert(df.queryExecution.optimizedPlan.toString.contains("__rj_b"))
    } finally {
      spark.catalog.dropTempView("rj_points")
      spark.catalog.dropTempView("rj_intervals")
    }
  }

  test("guard: an open-ended interval fails fast under the rewrite") {
    import spark.implicits._
    val points = Seq((1L, 10L, 100L)).toDF("k", "t", "pid")
    val sentinel = Seq((1L, 0L, Long.MaxValue, 500L)).toDF("k2", "lo", "hi", "iid")
    withRule(10L) {
      val df = naiveJoin(points, sentinel)
      assert(df.queryExecution.optimizedPlan.toString.contains("__rj_b"))
      val ex = intercept[Exception] { df.collect() }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("spans more than"), s"wrong failure: $msgs")
      // raising the cap conf far enough is honored (small bounded case)
      val bounded = Seq((1L, 0L, 5000L, 501L)).toDF("k2", "lo", "hi", "iid")
      spark.conf.set(BucketedRangeJoinRule.MaxBucketsKey, "100")
      try {
        val ex2 = intercept[Exception] { naiveJoin(points, bounded).collect() }
        val m2 = Iterator.iterate(ex2: Throwable)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
        assert(m2.contains("spans more than"))
        spark.conf.set(BucketedRangeJoinRule.MaxBucketsKey, "1000")
        assert(naiveJoin(points, bounded).collect().length == 1)
      } finally spark.conf.unset(BucketedRangeJoinRule.MaxBucketsKey)
    }
  }
}
