package graft.core

import org.apache.spark.sql.DataFrame

/** Minimum-parallelism guard for compute-heavy map/join stages (guide
  * §2.5 "input skew: one huge unsplittable file ... repartition
  * immediately after the read").
  *
  * A parquet scan parallelizes across FILES and ROW GROUPS, never within
  * a row group. A table that arrives as one file with one row group —
  * a small fixture, a single upstream writer task, one gzip member —
  * therefore plans as ONE scan task, and every fused map stage above it
  * (shingling, Levenshtein fan-out, image decode, PQ encoding) runs on
  * one core regardless of cluster size. The operators below this guard
  * do per-row work that is orders of magnitude heavier than a row's
  * shuffle cost, so when the input's partitioning is below the
  * cluster's core count we round-robin repartition up to
  * `defaultParallelism` BEFORE the expensive map.
  *
  * Scale honesty: the repartition is CONDITIONAL on the observed scan
  * partitioning — a 100 TB input already split into thousands of
  * tasks takes the `df` branch and plans NO extra exchange. The target
  * width is `sparkContext.defaultParallelism` (= total cores), never a
  * constant, so the same code adapts from `local[4]` to a cluster.
  * Round-robin repartition is retry-safe (sort-before-repartition is on
  * by default, SPARK-23207).
  *
  * Correctness: only safe where downstream math is insensitive to row
  * order and partition boundaries — integer counts, min/max, hashes,
  * per-row maps, per-pair scores, bounded top-k with total tie-breaks.
  * Do NOT put it under order-sensitive float accumulations (Welford
  * moments, unsorted float sums) whose oracle compare is bit-exact.
  *
  * Streaming frames cannot report partitioning (no RDD before the
  * micro-batch), so [[widenStream]] repartitions unconditionally —
  * used only where a micro-batch fans out against a static side and
  * the per-row join work dwarfs one narrow exchange of the batch.
  */
object Par {
  /** `df` repartitioned round-robin to `defaultParallelism` iff its
    * current plan yields fewer partitions than that; otherwise `df`
    * unchanged (no exchange added). Batch frames only. */
  def widen(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df
  }

  /** [[widen]] for frames that may be streaming: a streaming frame is
    * repartitioned unconditionally (its per-batch partitioning cannot
    * be inspected at plan time); batch frames take the conditional
    * path. */
  def widenStream(df: DataFrame): DataFrame =
    if (df.isStreaming)
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else widen(df)
}
