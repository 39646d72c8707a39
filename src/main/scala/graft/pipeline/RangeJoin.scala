package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Point-in-interval range join — the second of the canonical operators
  * Spark's join zoo lacks (with [[AsofJoin]]). The naive formulation
  * `p JOIN i ON key AND p.t BETWEEN i.lo AND i.hi` plans as a
  * key-equi-join whose per-key output is |points|×|intervals| pairs
  * filtered AFTER materialization — quadratic in the hot key.
  *
  * Bucketed formulation: chop time into fixed `bucketWidth` chunks; a
  * point lands in exactly ONE bucket, an interval is replicated to the
  * ⌈length/width⌉ buckets it overlaps, and the join becomes an
  * equi-join on (key, bucket) followed by the exact containment filter
  * — per-bucket work is local, the shuffle key is (key, bucket) so a
  * hot key spreads across buckets, and interval replication is bounded
  * by interval length / width (pick width ≈ the median interval
  * length). No duplicates: each point meets an interval only in the
  * point's own bucket. AQE skew-join still applies on top.
  */
object RangeJoin {

  /** Join each point row to every interval of the same key containing
    * its `ptCol` (inclusive bounds). Inner join: points in no interval
    * drop out. Interval columns ride along except key columns.
    *
    * `maxBucketsPerInterval` bounds the replication factor: an interval
    * spanning more buckets (an open-ended sentinel like hi =
    * Long.MaxValue, or a width far below the interval scale) fails fast
    * with a clear message instead of materializing millions of rows per
    * interval (Spark's `sequence` itself throws past ~2^31 elements, and
    * executors OOM well before). Pre-filter sentinels or raise the
    * width; silently clamping would drop matches. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 1000000L): DataFrame = {
    require(keyCols.nonEmpty, "range join needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive: $maxBucketsPerInterval")
    val pB = points.withColumn("__b",
      F.floor(F.col(ptCol) / F.lit(bucketWidth)))
    val bLo = F.floor(F.col(startCol) / F.lit(bucketWidth))
    val bHi = F.floor(F.col(endCol) / F.lit(bucketWidth))
    val guardedHi = F.when(bHi - bLo >= F.lit(maxBucketsPerInterval),
      F.raise_error(F.concat(
        F.lit(s"range join interval [${startCol}, ${endCol}] spans more " +
          s"than $maxBucketsPerInterval buckets at width $bucketWidth " +
          "(open-ended interval or width too small?): ["),
        F.col(startCol).cast("string"), F.lit(", "),
        F.col(endCol).cast("string"), F.lit("]"))).cast("long"))
      .otherwise(bHi)
    val iB = intervals.withColumn("__b", F.explode(F.sequence(bLo, guardedHi)))
    val joinKeys = keyCols :+ "__b"
    pB.join(iB, joinKeys)
      .filter(F.col(ptCol) >= F.col(startCol) &&
        F.col(ptCol) <= F.col(endCol))
      .drop("__b")
  }
}
