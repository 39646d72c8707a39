package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Dedup

/** Streaming near-duplicate flagging against a STATIC corpus index — the
  * online half of the dedup pipeline: the corpus index is built once in
  * batch ([[Dedup.minHashIndex]], two pruned columns), then arriving
  * documents are checked micro-batch by micro-batch before admission.
  *
  * Each micro-batch runs the same candidate-join + exact-Jaccard
  * verification as the batch path ([[Dedup.nearDupsAgainstIndex]]) inside
  * `foreachBatch` — a stream-STATIC join per batch, no streaming state,
  * no watermark: dedup-against-index is per-document, so batch boundaries
  * cannot change results. Output appends one parquet row per flagged
  * (doc, index-doc) pair with the batch id for audit. Sink is
  * at-least-once on retries (idempotent readers dedupe on
  * (a, b, batch_id)); the flag decision itself is deterministic.
  */
object DedupStream {

  def flagAgainstIndex(
      stream: DataFrame,
      index: DataFrame,
      textCol: String,
      idCol: String,
      outPath: String,
      numPerm: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val flagged = Dedup.nearDupsAgainstIndex(
          batch, index, textCol, idCol, numPerm, bands, threshold, maxBucketSize)
        flagged.withColumn("batch_id", F.lit(batchId))
          .write.mode("append").parquet(outPath)
      }
      .start()
}
