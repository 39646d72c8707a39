package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.pipeline.Sessionize

/** Streaming sessionization (flatMapGroupsWithState): streamed closed
  * sessions equal the batch operator's on the real events table. */
class SessionStreamSpec extends SparkSpec {

  test("streamed sessions equal batch sessions under the gap-close + timeout-flush rule") {
    val batch = eventsDF
    val sdf = graft.api.StandardQueries.rebuildTs(
      spark.readStream.schema(table("events").schema)
        .parquet(graft.api.StandardQueries.streamableDir(s"$sfDir/events.parquet")))
    val qn = "ssz_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = SessionStream.sessions(sdf, gapSeconds = 21600L)
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // batch sessions; each user's LAST session is emitted only if the
    // trailing no-data micro-batch's event-time timeout fired for it:
    // timer (end_us + gap)/1000 + 1 ms strictly below the final
    // watermark (max event time − 1h delay) — Spark's
    // processTimedOutState fires on timeoutTimestamp < watermark
    val all = Sessionize.sessions(batch, "user_id", "ts", 21600L,
      "event_id", "value", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    val lastSeq = all.keys.groupBy(_._1).map { case (u, ks) =>
      u -> ks.map(_._2).max
    }
    val wmMs = all.values.map(_._3).max / 1000L - 3600L * 1000L
    val expected = all.filter { case ((u, seq), s) =>
      seq < lastSeq(u) || (s._3 + 21600L * 1000000L) / 1000L + 1L < wmMs
    }
    assert(expected.nonEmpty, "fixture should close at least one session")
    // both regimes must actually occur or the test proves nothing
    assert(expected.size < all.size, "some final session should stay open")
    assert(expected.exists { case ((u, seq), _) => seq == lastSeq(u) },
      "some final session should flush via the event-time timeout")
    assert(streamed == expected)
  }

  test("gap closure and the bounded event-type set on a hand-built stream") {
    import spark.implicits._
    // one user, 3 events: two in session 1 (one gap-second apart), one
    // far later — session 1 must be EMITTED, session 2 stays open
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, Option[Double], String)](spark)
    mem.addData(
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, Some(1.0), "a"),
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 2L, None, "b"),
      (7L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 3L, Some(2.0), "a"))
    val df = mem.toDF().toDF("user_id", "ts", "event_id", "value", "event_type")
    val qn = "ssg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = SessionStream.sessions(df, gapSeconds = 60L, maxEventTypes = 1)
      .writeStream.format("memory").queryName(qn).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table(qn).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 2L)            // n_events
    assert(r.getLong(5) == 1L)            // n_event_types capped at 1
    assert(r.getLong(6) == 1L)            // n_values
    assert(r.getLong(7) == 30L)           // duration_secs
  }

  test("session_seq continues across an event-time timeout flush") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, Option[Double], String)](spark)
    val df = mem.toDF().toDF("user_id", "ts", "event_id", "value", "event_type")
    val qn = "ssc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = SessionStream.sessions(df, gapSeconds = 60L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(qn).outputMode("append").start()
    def batch(rows: (Long, java.sql.Timestamp, Long, Option[Double], String)*)
        : Unit = { mem.addData(rows: _*); q.processAllAvailable() }
    // user 7's first session; user 8 only exists to advance the watermark
    batch((7L, ts("2024-01-01 00:00:00"), 1L, None, "a"))
    batch((8L, ts("2024-01-01 02:00:00"), 2L, None, "a"))
    // watermark (from the 02:00 event) passes 7's gap horizon → timeout
    // flushes session 1 in this batch
    batch((8L, ts("2024-01-01 04:00:00"), 3L, None, "a"))
    // user 7 returns AFTER the flush: must continue as session 2
    batch((7L, ts("2024-01-01 05:00:00"), 4L, None, "a"))
    // two more watermark pushes: flush 7's second session via timeout too
    batch((8L, ts("2024-01-01 08:00:00"), 5L, None, "a"))
    batch((8L, ts("2024-01-01 10:00:00"), 6L, None, "a"))
    q.stop()
    val sevens = spark.table(qn).filter($"user_id" === 7L).collect()
      .map(r => (r.getLong(1), r.getLong(3))).sortBy(_._2)
    // before the sentinel fix this was Seq(1, 1): the counter reset after
    // the timeout flush and session 2 duplicated (user_id, session_seq)
    assert(sevens.map(_._1).toSeq == Seq(1L, 2L),
      s"expected session_seq 1,2 got ${sevens.toSeq}")
  }

  /** Run one user-7 story against a TTL'd session stream: session 1 at
    * 00:00, watermark advanced via user-8 events at `pushes`, user 7
    * returning at `ret`, then two more pushes to flush the second
    * session. Returns user 7's (session_seq, start_us) pairs in start
    * order. */
  private def ttlStory(ttlSeconds: Long, pushes: Seq[String], ret: String,
      flushes: Seq[String]): Seq[(Long, Long)] = {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, Option[Double], String)](spark)
    val df = mem.toDF().toDF("user_id", "ts", "event_id", "value", "event_type")
    val qn = "ttl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = SessionStream.sessions(df, gapSeconds = 60L,
        watermarkDelay = "0 seconds", sequenceTtlSeconds = Some(ttlSeconds))
      .writeStream.format("memory").queryName(qn).outputMode("append").start()
    var eid = 0L
    def batch(user: Long, at: String): Unit = {
      eid += 1; mem.addData((user, ts(at), eid, None, "a"))
      q.processAllAvailable()
    }
    batch(7L, "2024-01-01 00:00:00")
    pushes.foreach(batch(8L, _))
    batch(7L, ret)
    flushes.foreach(batch(8L, _))
    q.stop()
    spark.table(qn).filter($"user_id" === 7L).collect()
      .map(r => (r.getLong(1), r.getLong(3))).sortBy(_._2).toSeq
  }

  test("sequence TTL: sentinel expires, returning user restarts at session_seq 1") {
    // gap 60s + ttl 1h → sentinel horizon 01:01:00; the 02:00/02:10
    // pushes expire it (no emission), so 7's 03:00 return restarts at 1
    val got = ttlStory(3600L,
      pushes = Seq("2024-01-01 00:10:00", "2024-01-01 00:20:00",
        "2024-01-01 02:00:00", "2024-01-01 02:10:00"),
      ret = "2024-01-01 03:00:00",
      flushes = Seq("2024-01-01 05:00:00", "2024-01-01 06:00:00"))
    assert(got.map(_._1) == Seq(1L, 1L), s"expected restart at 1, got $got")
    assert(got.map(_._2) ==
      Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L,
        java.sql.Timestamp.valueOf("2024-01-01 03:00:00").getTime * 1000L))
  }

  test("sequence TTL: numbering continues when the user returns within the TTL") {
    // same story, ttl 1 day → horizon far past the 02:10 watermark; the
    // sentinel survives and 7's return continues as session 2
    val got = ttlStory(86400L,
      pushes = Seq("2024-01-01 00:10:00", "2024-01-01 00:20:00",
        "2024-01-01 02:00:00", "2024-01-01 02:10:00"),
      ret = "2024-01-01 03:00:00",
      flushes = Seq("2024-01-01 05:00:00", "2024-01-01 06:00:00"))
    assert(got.map(_._1) == Seq(1L, 2L), s"expected continuation 1,2, got $got")
  }

  test("sequence TTL: horizon behind the watermark clamps to expire-next-batch") {
    // the flush happens with wm=04:00 already far past last+gap+ttl
    // (00:02:00) — the setTimeoutTimestamp clamp (wm+1ms) must re-arm
    // without throwing, and the sentinel dies on the next push
    val got = ttlStory(60L,
      pushes = Seq("2024-01-01 04:00:00", "2024-01-01 04:10:00",
        "2024-01-01 04:20:00"),
      ret = "2024-01-01 05:00:00",
      flushes = Seq("2024-01-01 07:00:00", "2024-01-01 08:00:00"))
    assert(got.map(_._1) == Seq(1L, 1L), s"expected restart at 1, got $got")
  }

  test("sequence TTL: a near-overflow TTL saturates to retain-forever") {
    // Long.MaxValue/2 seconds overflows µs naively; saturation must make
    // it behave as retain-nearly-forever (numbering continues), not
    // wrap negative and expire next batch
    val got = ttlStory(Long.MaxValue / 2,
      pushes = Seq("2024-01-01 00:10:00", "2024-01-01 00:20:00",
        "2024-01-01 02:00:00", "2024-01-01 02:10:00"),
      ret = "2024-01-01 03:00:00",
      flushes = Seq("2024-01-01 05:00:00", "2024-01-01 06:00:00"))
    assert(got.map(_._1) == Seq(1L, 2L),
      s"huge TTL must behave as retain-forever, got $got")
  }
}
