package graft.analysis

import java.sql.Timestamp

import graft.SparkSpec

class MonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, n: Int, series: String = "s") =
    (0 until n).map(i =>
      (series, new Timestamp(1704067200000L + day * 86400000L + i * 1000L)))

  test("ewmaCusumChart: hand-checked fixed-point recursion with an alarm") {
    // series s: days of 10, 10, then a level shift to 30, 30
    val df = (ev(0, 10) ++ ev(1, 10) ++ ev(2, 30) ++ ev(3, 30))
      .toDF("event_type", "ts")
    val rows = Monitor.ewmaCusumChart(df, "event_type", "ts",
      alphaNum = 1, alphaDen = 8, slack = 3, threshold = 10).collect()
    assert(rows.length == 4)
    val S = 1000000L
    // day 0: burn-in
    assert(rows(0).getLong(2) == 10L && rows(0).getLong(3) == 10 * S)
    assert(rows(0).getLong(4) == 0L && rows(0).getLong(5) == 0L && !rows(0).getBoolean(6))
    // day 1: resid = 0; e stays 10S; cusum drains to 0
    assert(rows(1).getLong(4) == 0L && rows(1).getLong(3) == 10 * S)
    assert(rows(1).getLong(5) == 0L)
    // day 2: resid = 20S; cusum = 17S; ewma = (30S + 7*10S)/8 = 12.5S
    assert(rows(2).getLong(4) == 20 * S)
    assert(rows(2).getLong(5) == 17 * S)
    assert(rows(2).getLong(3) == 12500000L)
    assert(rows(2).getBoolean(6)) // 17 > 10
    // day 3: resid = 30S - 12.5S = 17.5S; cusum = 17S + 17.5S - 3S = 31.5S
    assert(rows(3).getLong(4) == 17500000L)
    assert(rows(3).getLong(5) == 31500000L)
    assert(rows(3).getBoolean(6))
  }

  test("ewmaCusumChart: series are independent; cusum floors at zero") {
    val df = (ev(0, 20, "a") ++ ev(1, 5, "a") ++ ev(0, 7, "b") ++ ev(1, 7, "b"))
      .toDF("event_type", "ts")
    val rows = Monitor.ewmaCusumChart(df, "event_type", "ts").collect()
    assert(rows.length == 4)
    val a1 = rows(1) // a day 1: big negative resid, cusum clamps to 0
    assert(a1.getString(0) == "a" && a1.getLong(4) < 0L && a1.getLong(5) == 0L)
    val b1 = rows(3)
    assert(b1.getString(0) == "b" && b1.getLong(4) == 0L && b1.getLong(5) == 0L)
  }

  test("trendTest: strictly increasing series gives S = n(n-1)/2, exact Sen slope") {
    // s: days 0..4 with counts 1,2,3,4,5 -> every pair concordant:
    // S = 10; no ties -> Var = 5*4*15/18; slopes all dx/dt with
    // median = 1.0 (each day adds exactly one event)
    val df = (0 until 5).flatMap(d => ev(d, d + 1)).toDF("event_type", "ts")
    val r = Monitor.trendTest(df, "event_type", "ts").collect().head
    assert(r.getLong(1) == 5L && r.getLong(2) == 10L)
    assert(r.getDouble(3) == 5.0 * 4.0 * 15.0 / 18.0)
    assert(r.getDouble(4) == 9.0 / math.sqrt(5.0 * 4.0 * 15.0 / 18.0))
    assert(r.getDouble(5) == 1.0)
  }

  test("trendTest: constant series has S = 0, degenerate variance, NULL z") {
    val df = (0 until 4).flatMap(d => ev(d, 7)).toDF("event_type", "ts")
    val r = Monitor.trendTest(df, "event_type", "ts").collect().head
    assert(r.getLong(2) == 0L)
    // all tied: tie term = n(n-1)(2n+5) -> var exactly 0 -> NULL z
    assert(r.getDouble(3) == 0.0 && r.isNullAt(4))
    assert(r.getDouble(5) == 0.0) // all pairwise slopes are 0
  }

  test("trendTest: a single-day series is reported with NULL z and NULL Sen slope") {
    // "solo" has one day (no pairs) alongside a normal 3-day series —
    // the degenerate series must NOT vanish from the report
    val df = (ev(0, 4, "solo") ++ (0 until 3).flatMap(d => ev(d, d + 1, "multi")))
      .toDF("event_type", "ts")
    val rows = Monitor.trendTest(df, "event_type", "ts")
      .orderBy("event_type").collect()
    assert(rows.length == 2)
    val multi = rows(0)
    assert(multi.getString(0) == "multi" && multi.getLong(1) == 3L)
    val solo = rows(1)
    assert(solo.getString(0) == "solo")
    assert(solo.getLong(1) == 1L && solo.getLong(2) == 0L)
    assert(solo.getDouble(3) == 0.0)      // var_s degenerates to 0
    assert(solo.isNullAt(4))              // NULL z as documented
    assert(solo.isNullAt(5))              // no pairwise slopes -> NULL Sen
  }

  test("ewmaCusumChart: over-cap fires the loud guard BEFORE any driver collect") {
    // the cap check is driven by a distributed count() of the chart
    // table — the error message carries the true cell count, proving
    // the bound was computed without materializing rows on the driver
    val df = (0 until 6).flatMap(d => ev(d, 2)).toDF("event_type", "ts")
    val e = intercept[IllegalArgumentException] {
      Monitor.ewmaCusumChart(df, "event_type", "ts", maxCells = 4)
    }
    assert(e.getMessage.contains("6 chart cells exceeds 4"))
  }

  test("trendTest: partitioning-invariant per series on the events fixture") {
    val a = Monitor.trendTest(eventsDF, "event_type", "ts")
      .orderBy("event_type").collect().map(_.toSeq)
    val b = Monitor.trendTest(eventsDF.repartition(13), "event_type", "ts")
      .orderBy("event_type").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq && a.length == 5)
  }

  test("ewmaCusumChart: partitioning-invariant on the events fixture; cap is loud") {
    val ev1 = eventsDF
    val a = Monitor.ewmaCusumChart(ev1, "event_type", "ts").collect().map(_.toSeq)
    val b = Monitor.ewmaCusumChart(ev1.repartition(13), "event_type", "ts")
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    intercept[IllegalArgumentException] {
      Monitor.ewmaCusumChart(ev1, "event_type", "ts", maxCells = 3)
    }
  }
}
