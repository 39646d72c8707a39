package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("transitions: per-user order, exact counts, integer-quantized p") {
    // user 1: a -> b -> a -> b ; user 2: a -> a -> c
    val df = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(1), "b", 2L), (1L, ts(2), "a", 3L),
      (1L, ts(3), "b", 4L),
      (2L, ts(0), "a", 5L), (2L, ts(1), "a", 6L), (2L, ts(2), "c", 7L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Markov.transitions(df, "user_id", "ts", "event_type", "event_id")
      .orderBy("prev", "next")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // from a: b 2, a 1, c 1 (rt 4); from b: a 1 (rt 1)
    assert(got.toSeq == Seq(
      ("a", "a", 1L, 250000L), ("a", "b", 2L, 500000L), ("a", "c", 1L, 250000L),
      ("b", "a", 1L, 1000000L)))
  }

  test("transitions: cross-user boundaries never create a transition; ties break by id") {
    val t0 = ts(0)
    // same timestamp: order by event_id decides a->b, not b->a
    val df = Seq((1L, t0, "a", 1L), (1L, t0, "b", 2L), (2L, t0, "z", 3L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Markov.transitions(df, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 1L))) // z is user 2's only event
  }

  test("topNext: argmax per state with count-desc then name-asc tie-break") {
    val df = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(1), "c", 2L),
      (2L, ts(0), "a", 3L), (2L, ts(1), "b", 4L),
      (3L, ts(0), "a", 5L), (3L, ts(1), "b", 6L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val top = Markov.topNext(df, "user_id", "ts", "event_type", "event_id").collect()
    assert(top.length == 1)
    assert(top.head.getString(0) == "a" && top.head.getString(1) == "b" &&
      top.head.getLong(2) == 2L)
    // tie case: equal counts elect the alphabetically first next state
    val tie = Seq((1L, ts(0), "a", 1L), (1L, ts(1), "c", 2L),
      (2L, ts(0), "a", 3L), (2L, ts(1), "b", 4L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val t2 = Markov.topNext(tie, "user_id", "ts", "event_type", "event_id").collect()
    assert(t2.head.getString(1) == "b")
  }

  test("transitions: partitioning-invariant on the events fixture") {
    val ev = eventsDF
    val a = Markov.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("prev", "next").collect().map(_.toSeq)
    val b = Markov.transitions(ev.repartition(17), "user_id", "ts", "event_type",
      "event_id").orderBy("prev", "next").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }
}
