package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

/** Greedy ordered-funnel semantics on hand-built streams. */
class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("greedy chain: order matters, pre-step events don't count, equal ts does") {
    import spark.implicits._
    val rows = Seq(
      // u1 completes all three in order
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 01:00:00"), "b"),
      (1L, ts("2024-01-01 02:00:00"), "c"),
      // u2: b BEFORE a, another b after ⇒ reaches b via the later one; no c
      (2L, ts("2024-01-01 00:00:00"), "b"),
      (2L, ts("2024-01-01 01:00:00"), "a"),
      (2L, ts("2024-01-01 03:00:00"), "b"),
      // u3: c only ⇒ reaches nothing
      (3L, ts("2024-01-01 00:00:00"), "c"),
      // u4: a and b at the SAME instant ⇒ b still counts (>=)
      (4L, ts("2024-01-01 05:00:00"), "a"),
      (4L, ts("2024-01-01 05:00:00"), "b"),
      // u5: ONLY a pre-a b ⇒ reaches a but never b
      (5L, ts("2024-01-01 00:00:00"), "b"),
      (5L, ts("2024-01-01 01:00:00"), "a"))
      .toDF("user_id", "ts", "event_type").repartition(3)
    val got = Funnel.funnel(rows, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // b: u1, u2 (via the post-a b), u4 — u5's pre-a b does not count
    assert(got == Map("a" -> 4L, "b" -> 3L, "c" -> 1L))
  }

  test("cohortRetention: hand case with exact day offsets") {
    import spark.implicits._
    // u1 first day 0, active days {0, 1, 7}; u2 first day 0, {0, 2};
    // u3 first day 1, {1, 2}; day numbers via whole-day timestamps
    def t(day: Int, h: Int = 0) = ts(f"2024-01-${day + 1}%02d $h%02d:00:00")
    val rows = Seq(
      (1L, t(0)), (1L, t(0, 5)), (1L, t(1)), (1L, t(7)),
      (2L, t(0)), (2L, t(2)),
      (3L, t(1)), (3L, t(2)))
      .toDF("user_id", "ts").repartition(3)
    val got = Retention.cohortRetention(rows, "user_id", "ts", Seq(1, 7))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val day0 = got.keys.min
    assert(got(day0) == ((2L, 1L, 1L)))      // u1+u2; d1: u1; d7: u1
    assert(got(day0 + 1) == ((1L, 1L, 0L))) // u3; d1: u3 active day 2
  }

  test("chain is strictly ordered: step 3 before step 2 completes never counts") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 01:00:00"), "c"), // c precedes b ⇒ not counted
      (1L, ts("2024-01-01 02:00:00"), "b"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(rows, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 0L))
  }
}
