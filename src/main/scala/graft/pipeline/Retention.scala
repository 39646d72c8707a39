package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Cohort retention — users grouped by first-activity day, counted again
  * at fixed day offsets (the standard growth-analytics table; the last
  * event-analytics primitive next to [[Sessionize]] and [[Funnel]]).
  *
  * Scale shape: ONE user-keyed exchange (map-side combined) folds each
  * user into (first day, active-day set) — the set is bounded by the
  * corpus' DAY SPAN, not activity volume — then per-user retention
  * flags are plain array lookups and the cohort rollup is a second,
  * cohort-day-sized exchange. No join, no multi-column countDistinct
  * expand (the naive distinct+join formulation plans 4 exchanges plus a
  * broadcast of the per-user table, which is NOT small at scale). All
  * outputs are exact integers. */
object Retention {

  /** One row per cohort day: cohort size and distinct users active again
    * at exactly each `dayOffsets` offset. Days are UTC epoch-day
    * numbers. */
  def cohortRetention(
      df: DataFrame, userCol: String, tsCol: String,
      dayOffsets: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(dayOffsets.nonEmpty, "need at least one day offset")
    val perUser = df
      .filter(F.col(userCol).isNotNull && F.col(tsCol).isNotNull)
      .select(F.col(userCol).as("__u"),
        F.floor(F.unix_micros(F.col(tsCol)) / F.lit(86400000000L)).as("__d"))
      .groupBy("__u")
      .agg(F.min("__d").as("__d0"), F.collect_set("__d").as("__days"))
    val aggs = F.count(F.lit(1)).as("n_users") +:
      dayOffsets.map(k => F.sum(F.array_contains(
        F.col("__days"), F.col("__d0") + k).cast("long")).as(s"retained_d$k"))
    perUser.groupBy(F.col("__d0").as("cohort_day"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
