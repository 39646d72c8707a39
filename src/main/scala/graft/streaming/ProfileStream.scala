package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Row

import graft.api.{Profiler, ProfileStore}

/** Rolling / streaming profiles (reference TimedRollingLogger,
  * `api/logger/rolling.py:63-262`) re-expressed as Structured Streaming:
  * event-time tumbling windows + watermark instead of wall-clock rollover
  * threads.
  *
  * Semantics divergence (documented, an improvement — SURVEY §7.4): the
  * reference rotates on processing time and simply merges late rows into
  * whatever profile is open; here windows are event-time and the
  * watermark bounds lateness, so a replayed/backfilled stream produces
  * identical profiles to a batch run over the same data — the property
  * the store's merge algebra needs.
  *
  * Scale shape: the windowed aggregation is the same partial/final
  * sketch aggregation as batch profiling, keyed by (window, segment);
  * state per key is KB-bounded sketch buffers, and the sink appends
  * KB-scale profile rows to the store — the stream itself is never
  * buffered.
  */
object ProfileStream {

  /** Windowed profile aggregation plan over a streaming (or batch)
    * DataFrame: groupBy tumbling window [+ segment columns] with the
    * profiler's metric aggregates for `columns`. */
  def windowedProfileDF(
      sdf: DataFrame,
      tsCol: String,
      window: String,
      watermark: Option[String] = None,
      profiler: Profiler = new Profiler(),
      columns: Option[Seq[String]] = None,
      segmentColumns: Seq[String] = Nil): DataFrame = {
    val withWm = watermark.map(w => sdf.withWatermark(tsCol, w)).getOrElse(sdf)
    val profiled = columns.getOrElse(
      sdf.schema.fields.map(_.name).toSeq
        .filterNot(n => n == tsCol || segmentColumns.contains(n)))
    val aggs = profiler.aggColumns(sdf.schema, Some(profiled))
    val keys = F.window(F.col(tsCol), window) +:
      segmentColumns.map(n => F.col(n).cast("string").as(s"segment_$n"))
    withWm.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Run rolling profiles as a streaming query appending to a
    * [[ProfileStore]]: each micro-BATCH is profiled independently
    * (window groupBy over just the batch's rows inside foreachBatch), so
    * every input row is counted in exactly one stored profile and the
    * store's per-window merge is plain monoid algebra — append-only
    * correct regardless of how the stream is split into batches. (A
    * streaming-state aggregation in update mode would re-emit CUMULATIVE
    * window rows each batch, double-counting on append.) The watermark
    * bounds state for the streaming-aggregation path
    * ([[windowedProfileDF]]); here lateness only means a late row lands
    * in a later store row for the same window — merged reads are
    * unaffected. */
  def toStore(
      sdf: DataFrame,
      tsCol: String,
      window: String,
      /** NOTE: with the per-batch profiling sink there is no streaming
        * aggregation state, so the watermark does NOT drop late rows —
        * they land in a later store row for the same window (merged
        * reads are unaffected). Kept so switching between this sink and
        * the stateful [[windowedProfileDF]] path is signature-compatible. */
      watermark: String,
      storePath: String,
      datasetId: String,
      profiler: Profiler = new Profiler(),
      columns: Option[Seq[String]] = None,
      segmentColumns: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    sdf.withWatermark(tsCol, watermark).writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val store = new ProfileStore(batch.sparkSession, storePath)
        val windowed =
          windowedProfileDF(batch, tsCol, window, None, profiler, columns, segmentColumns)
        val flat = windowed.select(
          F.unix_timestamp(F.col("window.start")).*(1000).as("__ts") +:
            windowed.columns.filterNot(_ == "window").map(F.col): _*)
        // rows are KB-scale profiles; serialization happens on executors
        // (ProfileStore.writeWindowed), so a high-cardinality segmented
        // stream appends straight to the store with no driver funnel
        store.writeWindowed(flat, segmentColumns.length, datasetId, profiler.config.quantiles)
      }
      .start()
  }
}
