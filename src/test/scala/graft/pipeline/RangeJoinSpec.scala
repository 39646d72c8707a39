package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Bucketed point-in-interval join: exactness vs the naive inequality
  * join, boundary inclusivity, bucket-boundary straddling, and
  * no-duplicate output. */
class RangeJoinSpec extends SparkSpec {

  test("hand case: inclusive bounds, straddling intervals, no duplicates") {
    import spark.implicits._
    val points = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 35L, 102L), (1L, 99L, 103L),
      (2L, 10L, 200L))
      .toDF("k", "t", "pid").repartition(3)
    // interval 5..35 straddles buckets (width 10): replicated to 4
    // buckets but each point matches it ONCE; bounds inclusive both ends
    val intervals = Seq(
      (1L, 5L, 35L, 500L), (1L, 36L, 50L, 501L), (2L, 0L, 9L, 502L))
      .toDF("k", "lo", "hi", "iid").repartition(2)
    val got = RangeJoin.pointInInterval(
      points, intervals, Seq("k"), "t", "lo", "hi", bucketWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == Seq((100L, 500L), (101L, 500L), (102L, 500L)))
    assert(got.length == got.distinct.length)
  }

  test("matches the naive inequality join on random data, any bucket width") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val points = Seq.fill(400)((rng.nextInt(5).toLong,
      rng.nextInt(1000).toLong, rng.nextLong())).toDF("k", "t", "pid")
    val intervals = Seq.fill(60) {
      val lo = rng.nextInt(1000).toLong
      (rng.nextInt(5).toLong, lo, lo + rng.nextInt(200).toLong, rng.nextLong())
    }.toDF("k", "lo", "hi", "iid")
    val naive = points.join(intervals, "k")
      .filter(F.col("t") >= F.col("lo") && F.col("t") <= F.col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(7L, 100L, 5000L)) {
      val got = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "t", "lo", "hi", bucketWidth = w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length, s"width $w duplicates")
      assert(got.toSet == naive, s"width $w")
    }
  }

  test("open-ended sentinel interval fails fast instead of exploding") {
    import spark.implicits._
    val points = Seq((1L, 10L, 100L)).toDF("k", "t", "pid")
    val sentinel = Seq((1L, 0L, Long.MaxValue, 500L)).toDF("k", "lo", "hi", "iid")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, sentinel, Seq("k"), "t", "lo", "hi",
        bucketWidth = 10L).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("spans more than"), s"wrong failure: $msgs")
    // a wide-but-bounded interval under the cap still works
    val ok = RangeJoin.pointInInterval(points,
      Seq((1L, 0L, 5000L, 500L)).toDF("k", "lo", "hi", "iid"),
      Seq("k"), "t", "lo", "hi", bucketWidth = 10L).collect()
    assert(ok.length == 1)
  }
}
