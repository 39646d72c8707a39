package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Cohort retention — users grouped by first-activity day, counted again
  * at fixed day offsets (the standard growth-analytics table; the last
  * event-analytics primitive next to [[Sessionize]] and [[Funnel]]).
  *
  * Scale shape: activity collapses to DISTINCT (user, day) first — the
  * big reduction, map-side combined — then first-day per user is a
  * groupBy on the same key (one exchange serves both via co-partition),
  * the activity-to-cohort join is user-keyed (no broadcast needed, both
  * sides already hash by user), and the final cohort rollup aggregates
  * ≤ (users × active days) rows down to one row per cohort day. All
  * outputs are exact integers. */
object Retention {

  /** One row per cohort day: cohort size and distinct users active again
    * at exactly each `dayOffsets` offset. Days are UTC epoch-day
    * numbers. */
  def cohortRetention(
      df: DataFrame, userCol: String, tsCol: String,
      dayOffsets: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(dayOffsets.nonEmpty, "need at least one day offset")
    val act = df
      .filter(F.col(userCol).isNotNull && F.col(tsCol).isNotNull)
      .select(F.col(userCol).as("__u"),
        F.floor(F.unix_micros(F.col(tsCol)) / F.lit(86400000000L)).as("__d"))
      .distinct()
    val first = act.groupBy("__u").agg(F.min("__d").as("__d0"))
    val aggs = F.countDistinct(F.col("__u")).as("n_users") +:
      dayOffsets.map(k => F.countDistinct(
        F.when(F.col("__d") === F.col("__d0") + k, F.col("__u")))
        .as(s"retained_d$k"))
    act.join(first, "__u")
      .groupBy(F.col("__d0").as("cohort_day"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
