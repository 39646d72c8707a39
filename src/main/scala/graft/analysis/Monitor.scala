package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Sequential control charts over time-bucketed series — the
  * profile-TIMELINE monitors that sit downstream of the per-batch
  * drift family ([[DriftExact]] compares two snapshots; this watches a
  * metric's whole history): an EWMA forecast chart and a one-sided
  * CUSUM drift detector (Page 1954; the standard SPC pair) over daily
  * event volumes per series.
  *
  * Exactness: the recursions run in INTEGER fixed point at scale
  * S = 10⁶ — `e₁ = S·x₁`, `e_t = (num·S·x_t + (den−num)·e_{t−1}) div
  * den`, `resid_t = S·x_t − e_{t−1}`,
  * `c_t = max(0, c_{t−1} + resid_t − S·slack)` — every step integer
  * division/addition via Math.*Exact (loud past 2⁶³), so the chart is
  * bit-identical across engines and replays in SQL as a recursive CTE.
  * A float EWMA would accumulate rounding differently per engine;
  * this cannot.
  *
  * Scale shape: the sequential part is inherently ordered, so the
  * cluster does what it is good at — ONE map-side-combined
  * `groupBy(series, day)` exchange collapses any corpus to the
  * BOUNDED chart table (series × days; loud `maxCells` cap, the
  * [[graft.analysis.DataAudit.kendallTau]] histogram contract) — and
  * the driver folds each series' few hundred buckets. Charts are
  * per-series independent, so series parallelize trivially if ever
  * needed beyond the cap.
  *
  * (Reference analog: whylogs defers timeline monitoring to its SaaS;
  * the open library stops at profile-vs-profile drift — this is the
  * in-library timeline tier.)
  */
object Monitor {

  /** EWMA + CUSUM chart `(series, day, x, ewma_q, resid_q, cusum_q,
    * alarm)` over daily event counts per series. `alpha = alphaNum /
    * alphaDen` (default 1/8), `slack`/`threshold` in COUNT units
    * (CUSUM drains `slack` per day and alarms past `threshold`).
    * First bucket of each series is burn-in: `resid = cusum = 0`.
    * NULL series/timestamps drop. */
  def ewmaCusumChart(df: DataFrame, seriesCol: String, tsCol: String,
      alphaNum: Int = 1, alphaDen: Int = 8, slack: Long = 3L,
      threshold: Long = 10L, maxCells: Int = 100000): DataFrame = {
    require(alphaNum >= 1 && alphaDen > alphaNum, "need 0 < alpha < 1")
    val spark = df.sparkSession
    import spark.implicits._
    val S = 1000000L
    val cells = df
      .filter(F.col(seriesCol).isNotNull && F.col(tsCol).isNotNull)
      .groupBy(F.col(seriesCol).cast("string").as("__s"),
        F.to_date(F.date_trunc("day", F.col(tsCol))).as("__d"))
      .agg(F.count(F.lit(1)).as("__x"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    require(cells.length <= maxCells,
      s"${cells.length} chart cells exceeds $maxCells — coarsen the bucket or split series")
    val out = cells.groupBy(_._1).toSeq.flatMap { case (series, rows) =>
      var e = 0L; var c = 0L
      rows.sortBy(_._2.getTime).zipWithIndex.map { case ((_, day, x), i) =>
        val sx = Math.multiplyExact(S, x)
        val (resid, cNew, eNew) =
          if (i == 0) (0L, 0L, sx)
          else {
            val r = Math.subtractExact(sx, e)
            val cn = math.max(0L, Math.subtractExact(Math.addExact(c, r),
              Math.multiplyExact(S, slack)))
            val en = Math.addExact(Math.multiplyExact(alphaNum.toLong, sx),
              Math.multiplyExact((alphaDen - alphaNum).toLong, e)) / alphaDen
            (r, cn, en)
          }
        e = eNew; c = cNew
        (series, day, x, eNew, resid, cNew, cNew > Math.multiplyExact(S, threshold))
      }
    }
    out.toDF("series", "day", "x", "ewma_q", "resid_q", "cusum_q", "alarm")
      .orderBy("series", "day")
  }
}
