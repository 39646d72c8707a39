package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** As-of join semantics: greatest right ts ≤ left ts per key, equal-ts
  * visibility, right-side tie resolution, null for no-predecessor, and
  * the one-exchange plan. */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hand case: latest preceding snapshot, equal-ts visible, nulls before first") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 02:00:00"), 11L),
      (1L, ts("2024-01-01 04:00:00"), 12L),
      (2L, ts("2024-01-01 01:00:00"), 20L))
      .toDF("user_id", "ts", "event_id").repartition(3)
    val right = Seq(
      (1L, ts("2024-01-01 02:00:00"), 100L, 1.5), // equal-ts: visible to 11
      (1L, ts("2024-01-01 03:00:00"), 101L, 2.5),
      (9L, ts("2024-01-01 00:00:00"), 999L, 9.9)) // other key, never joins
      .toDF("user_id", "ts", "snap_id", "snap_v").repartition(2)
    val got = AsofJoin.asofLeft(left, right, Seq("user_id"), "ts", "ts",
      Seq("snap_id", "snap_v"), "snap_id")
      .collect().map(r => r.getLong(2) ->
        (Option(r.getAs[java.lang.Long]("snap_id")),
          Option(r.getAs[java.lang.Double]("snap_v")))).toMap
    assert(got(10L) == ((None, None)))              // before any snapshot
    assert(got(11L) == ((Some(100L), Some(1.5))))   // its own instant counts
    assert(got(12L) == ((Some(101L), Some(2.5))))   // latest, not first
    assert(got(20L) == ((None, None)))              // key 2 has no snapshots
  }

  test("right-side ties at one (key, ts) resolve to the larger tie column") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 01:00:00"), 10L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 5L, 0.5),
      (1L, ts("2024-01-01 00:00:00"), 7L, 0.7)) // same instant: 7 wins
      .toDF("user_id", "ts", "snap_id", "snap_v")
    val r = AsofJoin.asofLeft(left, right, Seq("user_id"), "ts", "ts",
      Seq("snap_id", "snap_v"), "snap_id").collect()(0)
    assert(r.getAs[Long]("snap_id") == 7L && r.getAs[Double]("snap_v") == 0.7)
  }

  test("property: matches a local argmax recomputation on random data with ties") {
    import spark.implicits._
    val rng = new scala.util.Random(53)
    val base = ts("2024-01-01 00:00:00").getTime
    def rts() = new Timestamp(base + rng.nextInt(500) * 1000L)
    val left = Seq.fill(400)((rng.nextInt(6).toLong, rts(), rng.nextLong()))
    val right = Seq.fill(150)((rng.nextInt(6).toLong, rts(), rng.nextInt(1000).toLong,
      rng.nextDouble()))
    val got = AsofJoin.asofLeft(
      left.toDF("user_id", "ts", "event_id").repartition(7),
      right.toDF("user_id", "ts", "snap_id", "snap_v").repartition(5),
      Seq("user_id"), "ts", "ts", Seq("snap_id", "snap_v"), "snap_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)) ->
        Option(r.getAs[java.lang.Long]("snap_id"))).toMap
    left.foreach { case (k, t, id) =>
      val cands = right.filter(r => r._1 == k && !r._2.after(t))
      val want =
        if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2.getTime, r._3))._3)
      assert(got((k, t, id)) == want, s"left ($k, $t, $id)")
    }
    assert(got.size == left.distinct.size)
  }

  test("plan: one exchange on the key, no cartesian pair blowup") {
    val ev = eventsDF
    val right = ev.filter(F.col("event_type") === "purchase")
      .select(F.col("user_id"), F.col("ts"), F.col("event_id").as("pid"))
    val out = AsofJoin.asofLeft(ev.select("user_id", "ts", "event_id"),
      right, Seq("user_id"), "ts", "ts", Seq("pid"), "pid")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))
    assert(shuffles == 1, s"expected 1 exchange (by key):\n${plan.take(3000)}")
    assert(!plan.contains("Join"), s"union+window, not a join:\n${plan.take(3000)}")
  }

  test("NULL keys never match (SQL semantics) and reserved names are refused") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), 100L, 1L), (None: Option[Long], 100L, 2L))
      .toDF("k", "t", "eid")
    val right = Seq(
      (Option(1L), 50L, 10L), (None: Option[Long], 60L, 11L))
      .toDF("k", "rt", "rid")
    val got = AsofJoin.asofLeft(left, right, Seq("k"), "t", "rt",
      Seq("rid"), "rid")
      .collect().map(r => (r.getLong(2), Option(r.getAs[java.lang.Long]("rid"))))
      .toMap
    assert(got(1L) == Some(10L))
    // the NULL-keyed left row must NOT pick up the NULL-keyed right row
    assert(got(2L) == None,
      "NULL = NULL matched — diverges from SQL ASOF join semantics")
    val bad = Seq((1L, 1L)).toDF("k", "__pay")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofLeft(bad, right, Seq("k"), "t", "rt", Seq("rid"), "rid")
    }
    assert(e.getMessage.contains("reserved"))
  }
}
