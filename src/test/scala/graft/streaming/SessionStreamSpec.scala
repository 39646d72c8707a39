package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.pipeline.Sessionize

/** Streaming sessionization (flatMapGroupsWithState): streamed closed
  * sessions equal the batch operator's on the real events table. */
class SessionStreamSpec extends SparkSpec {

  test("streamed sessions equal batch sessions under the gap-close + timeout-flush rule") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val batch = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    val sdf = spark.readStream.schema(raw.schema)
      .parquet(graft.api.StandardQueries.streamableDir(s"$sfDir/events.parquet"))
      .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
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
}
