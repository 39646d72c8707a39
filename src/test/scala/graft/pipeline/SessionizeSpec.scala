package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Gap-based sessionization: boundary arithmetic on hand-built event
  * streams, tie determinism, and the one-exchange plan shape the
  * scaladoc claims (windows and the session aggregate both cluster by
  * user, so Spark must not re-shuffle between them). */
class SessionizeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, t, id) => (u, ts(t), id, Option.empty[Double], "ev") }
      .toDF("user_id", "ts", "event_id", "value", "event_type")
      .repartition(5)
  }

  test("assign: a gap strictly greater than gapSeconds starts a new session") {
    val df = events(
      ("u1", "2024-01-01 00:00:00", 1L),
      ("u1", "2024-01-01 00:59:59", 2L), // 3599s gap — same session
      ("u1", "2024-01-01 01:59:59", 3L), // exactly 3600s — still same
      ("u1", "2024-01-01 03:00:00", 4L), // 3601s — new session
      ("u2", "2024-01-01 00:00:00", 5L)) // other user independent
    val got = Sessionize.assign(df, "user_id", "ts", 3600L, "event_id")
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("assign: equal timestamps order by the tie column deterministically") {
    // two events at the identical instant: the tie column decides which is
    // "first", so the numbering can't flap across partitionings
    val df = events(
      ("u1", "2024-01-01 00:00:00", 2L),
      ("u1", "2024-01-01 00:00:00", 1L),
      ("u1", "2024-01-01 02:00:01", 3L))
    val a = Sessionize.assign(df, "user_id", "ts", 7200L, "event_id")
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sessionize.assign(df.repartition(11), "user_id", "ts", 7200L, "event_id")
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    assert(a == b)
  }

  test("sessions: per-session aggregates are exact on a hand-built stream") {
    import spark.implicits._
    val df = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1L, Some(1.0), "click"),
      ("u1", ts("2024-01-01 00:30:00"), 2L, None, "view"),
      ("u1", ts("2024-01-01 05:00:00"), 3L, Some(2.0), "click"))
      .toDF("user_id", "ts", "event_id", "value", "event_type")
    val got = Sessionize.sessions(df, "user_id", "ts", 3600L,
      "event_id", "value", "event_type")
      .orderBy("session_seq").collect()
    assert(got.length == 2)
    val s1 = got(0)
    assert(s1.getAs[Long]("n_events") == 2L)
    assert(s1.getAs[Long]("n_event_types") == 2L)
    assert(s1.getAs[Long]("n_values") == 1L)
    assert(s1.getAs[Long]("duration_secs") == 1800L)
    val s2 = got(1)
    assert(s2.getAs[Long]("n_events") == 1L)
    assert(s2.getAs[Long]("duration_secs") == 0L)
  }

  test("plan: sessions() shuffles once, on the user key — no global sort") {
    val df = eventsDF
    val out = Sessionize.sessions(df, "user_id", "ts", 21600L,
      "event_id", "value", "event_type")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))
    assert(shuffles == 1, s"expected 1 exchange (by user):\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort leaked into the session plan:\n$plan")
  }
}
