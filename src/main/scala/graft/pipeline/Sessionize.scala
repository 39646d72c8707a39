package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Gap-based sessionization of an event stream — the standard
  * event-analytics operator (a session ends after `gapSeconds` of user
  * inactivity). No whylogs counterpart (the reference profiles events but
  * never groups them); this is a pipeline extension in the same family as
  * `window_profile`, and its per-session rows feed the profiler like any
  * other DataFrame.
  *
  * Scale: both windows partition BY USER — Spark hash-distributes the
  * users across executors and sorts each partition locally, so there is
  * exactly one exchange (by `userCol`) and never a global sort. Gap
  * arithmetic stays in integer epoch-microseconds until the caller asks
  * for seconds, so session boundaries are bit-exact across engines
  * (pinned by the DuckDB oracle on `events_sessionize`).
  */
object Sessionize {

  /** Tag each event with `session_seq` (1-based per user, in time order).
    * A new session starts when the gap from the user's previous event
    * exceeds `gapSeconds`. Ties on `tsCol` within a user are ordered by
    * `tieCol` so the numbering is deterministic.
    */
  def assign(df: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieCol: String): DataFrame = {
    val us = F.unix_micros(F.col(tsCol))
    val w = Window.partitionBy(userCol).orderBy(F.col(tsCol), F.col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("ts_us", us)
      .withColumn("gap_us", F.col("ts_us") - F.lag("ts_us", 1).over(w))
      .withColumn("new_session",
        F.when(F.col("gap_us").isNull ||
          F.col("gap_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq", F.sum("new_session").over(run))
      .drop("ts_us", "gap_us", "new_session")
  }

  /** Collapse assigned events into one row per session: event count,
    * start/end in epoch-microseconds, duration in whole seconds (integer
    * division — exact), distinct event types, and the value sum.
    */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieCol: String, valueCol: String,
      typeCol: String): DataFrame =
    assign(df, userCol, tsCol, gapSeconds, tieCol)
      .groupBy(F.col(userCol), F.col("session_seq"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        F.min(F.unix_micros(F.col(tsCol))).as("start_us"),
        F.max(F.unix_micros(F.col(tsCol))).as("end_us"),
        F.countDistinct(F.col(typeCol)).as("n_event_types"),
        F.sum(F.col(valueCol).isNotNull.cast("long")).as("n_values"))
      .withColumn("duration_secs",
        F.expr("(end_us - start_us) div 1000000"))
}
