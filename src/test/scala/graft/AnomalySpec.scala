package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.Anomaly

/** Rolling z-score anomaly detection: hand-computed scores, the
  * full-window gate, per-series independence, and partitioning
  * determinism. */
class AnomalySpec extends SparkSpec {

  test("rollingZ: spike over a flat baseline scores exactly; early points gated") {
    import spark.implicits._
    // series a: 3,3,3,5 with k=3 — the 5 has baseline mean 3, var 0 ⇒
    // std 0 ⇒ z NULL (flat baselines must not divide by zero);
    // series b: 1,2,3,10 — baseline of 10 is {1,2,3}: mean 2, std 1 ⇒ z 8
    val df = Seq(
      ("a", 1L, 3L), ("a", 2L, 3L), ("a", 3L, 3L), ("a", 4L, 5L),
      ("b", 1L, 1L), ("b", 2L, 2L), ("b", 3L, 3L), ("b", 4L, 10L))
      .toDF("series", "t", "n").repartition(3)
    val got = Anomaly.rollingZ(df, Seq("series"), "t", "n", k = 3, threshold = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), Option(r.getAs[java.lang.Double]("z")),
          Option(r.getAs[java.lang.Boolean]("is_anomaly")))).toMap
    // first three points of each series: trailing window not full ⇒ gated
    for (s <- Seq("a", "b"); t <- 1L to 3L)
      assert(got((s, t))._2.isEmpty && got((s, t))._3.isEmpty, s"($s,$t)")
    assert(got(("a", 1L))._1 == 0L && got(("b", 3L))._1 == 2L)
    // flat baseline: std 0 ⇒ no score
    assert(got(("a", 4L))._2.isEmpty)
    // b's spike: z = (10-2)/1 = 8, flagged
    assert(got(("b", 4L))._2.contains(8.0))
    assert(got(("b", 4L))._3.contains(true))
  }

  test("rollingZ: within-threshold points are unflagged, not null") {
    import spark.implicits._
    // baseline {1,3,5}: mean 3, var 4, std 2; point 4 ⇒ z = 0.5
    val df = Seq(("s", 1L, 1L), ("s", 2L, 3L), ("s", 3L, 5L), ("s", 4L, 4L))
      .toDF("series", "t", "n")
    val r = Anomaly.rollingZ(df, Seq("series"), "t", "n", k = 3)
      .filter(F.col("t") === 4L).collect()(0)
    assert(r.getAs[Double]("trail_mean") == 3.0)
    assert(r.getAs[Double]("trail_std") == 2.0)
    assert(r.getAs[Double]("z") == 0.5)
    assert(r.getAs[Boolean]("is_anomaly") == false)
  }

  test("rollingZ is deterministic across repartitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = for (s <- Seq("x", "y", "z"); t <- 1L to 40L)
      yield (s, t, (rng.nextInt(50) + 10).toLong)
    val df = rows.toDF("series", "t", "n")
    def run(parts: Int) = Anomaly.rollingZ(
      df.repartition(parts), Seq("series"), "t", "n", k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.getAs[java.lang.Double]("z"))).toMap
    assert(run(2) == run(13))
  }
}
