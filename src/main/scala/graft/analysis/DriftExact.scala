package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Exact (sketch-free) drift statistics computed distributed over the raw
  * column, complementing the profile-vs-profile path in [[Drift]] (which
  * works over two collected KB-scale sketch profiles and never rescans the
  * input). Use these when the two samples are co-resident in one table and
  * an EXACT statistic is wanted — validation runs, oracle checks, or
  * auditing the sketch path's error.
  *
  * Numeric parity by construction: [[ksStat]] stays in 64-bit integer
  * arithmetic until a single final division, so any engine computing the
  * same definition (e.g. the DuckDB oracle) produces the bit-identical
  * double; [[hellingerStat]] accumulates its ≤ nBins per-bin terms in
  * ascending bin order so the float sum order is pinned (same trick as the
  * `drift_chi2_stat` oracle).
  */
object DriftExact {

  /** Exact two-sample Kolmogorov–Smirnov statistic
    * D = sup_x |F_target(x) − F_ref(x)| between the rows where `isTarget`
    * holds and the rest, over non-null `valueCol`. Returns (D, nTarget,
    * nRef).
    *
    * Sketch-free analogue of [[Drift.ks]] (reference
    * `python/whylogs/viz/drift/column_drift_algorithms.py:339-363`, which
    * evaluates the two KLL CDFs on a quantile grid); here both ECDFs are
    * evaluated at every distinct value, where all suprema of the step
    * functions occur, so D is exact.
    *
    * Distributed shape — no global-sort window (a bare
    * `Window.orderBy` collapses to ONE partition and dies at scale):
    *  1. one map-side-combined groupBy(value) exchange → exact per-value
    *     counts for both samples (the only corpus-sized shuffle);
    *  2. `repartitionByRange(value)` of the DISTINCT values only, pinned
    *     with a localCheckpoint so both passes see identical splits;
    *  3. per-partition cumulative sums + O(numPartitions) driver-side
    *     prefix offsets broadcast back (same two-pass prefix-sum shape as
    *     [[graft.pipeline.Packing.withOffsets]]);
    *  4. D's numerator max|cumT·nRef − cumR·nTarget| stays integral —
    *     exact while nTarget·nRef fits a long (both ≲ 3·10⁹; beyond that
    *     use the sketch path [[Drift.ks]], whose error is then far below
    *     any decision threshold anyway).
    */
  def ksStat(df: DataFrame, valueCol: String, isTarget: Column): (Double, Long, Long) = {
    val x = df.filter(F.col(valueCol).isNotNull)
      .select(F.col(valueCol).as("__v"),
        F.when(isTarget, 1L).otherwise(0L).as("__ca"),
        F.when(isTarget, 0L).otherwise(1L).as("__cb"))
    val g = x.groupBy("__v")
      .agg(F.sum("__ca").as("__ca"), F.sum("__cb").as("__cb"))
      .repartitionByRange(F.col("__v"))
      .sortWithinPartitions("__v")
      .withColumn("__pid", F.spark_partition_id())
      .localCheckpoint(false)
    try {
      val totals = g.groupBy("__pid")
        .agg(F.sum("__ca").as("ta"), F.sum("__cb").as("tb"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val na = totals.map(_._2).sum
      val nb = totals.map(_._3).sum
      if (na == 0L || nb == 0L) return (0.0, na, nb)
      require(na <= Long.MaxValue / nb,
        s"nTarget*nRef overflows long ($na * $nb); use Drift.ks (sketch path)")
      var accA = 0L; var accB = 0L
      val bases = totals.map { case (pid, ta, tb) =>
        val row = (pid, accA, accB); accA += ta; accB += tb; row
      }
      val spark = df.sparkSession
      import spark.implicits._
      val baseDf = bases.toSeq.toDF("__pid2", "__baseA", "__baseB")
      val w = Window.partitionBy("__pid").orderBy("__v")
      val num = g.join(F.broadcast(baseDf), F.col("__pid") === F.col("__pid2"))
        .select(
          (F.sum("__ca").over(w) + F.col("__baseA")).as("__cca"),
          (F.sum("__cb").over(w) + F.col("__baseB")).as("__ccb"))
        .agg(F.max(F.abs(F.col("__cca") * nb - F.col("__ccb") * na)).as("num"))
        .collect()(0).getLong(0)
      (num.toDouble / (na * nb).toDouble, na, nb)
    } finally g.unpersist(blocking = false)
  }

  /** Exact Hellinger distance between the target/ref samples' histograms
    * on a fixed-width `nBins` grid spanning the pooled [min, max]:
    * H = sqrt( Σ_bins (√p_i − √q_i)² / 2 ), the same accumulation form as
    * [[Drift.hellinger]] (reference `column_drift_algorithms.py:436-455`
    * territory) with exact bin counts in place of the two KLL PMFs.
    * Returns (H, nTarget, nRef).
    *
    * Binning is `min(floor((v − lo) / width), nBins−1)` with
    * `width = (hi − lo) / nBins` — a single fp formula both engines
    * evaluate identically (the sketch path's split grid
    * `lo + (hi−lo)·i/n` can differ from this by one ulp AT bin
    * boundaries; this variant defines the boundary arithmetic, it does
    * not chase the sketch's). Empty-in-both bins contribute 0 and are
    * simply absent from the groupBy. One full-column pass for
    * (min, max), one map-side-combined groupBy(bin) exchange whose
    * result is ≤ nBins rows; the ≤ nBins per-bin terms are summed
    * driver-side in ascending bin order.
    */
  def hellingerStat(
      df: DataFrame, valueCol: String, isTarget: Column,
      nBins: Int = 30): (Double, Long, Long) = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val x = df.filter(F.col(valueCol).isNotNull)
      .select(F.col(valueCol).cast("double").as("__v"),
        F.when(isTarget, 1L).otherwise(0L).as("__ca"),
        F.when(isTarget, 0L).otherwise(1L).as("__cb"))
    val head = x.agg(
      F.min("__v").as("lo"), F.max("__v").as("hi"),
      F.sum("__ca").as("na"), F.sum("__cb").as("nb")).collect()(0)
    if (head.isNullAt(0)) return (0.0, 0L, 0L)
    val lo = head.getDouble(0); val hi = head.getDouble(1)
    val na = head.getLong(2); val nb = head.getLong(3)
    if (na == 0L || nb == 0L || !(hi > lo)) return (0.0, na, nb)
    val width = (hi - lo) / nBins
    val bin = F.least(
      F.floor((F.col("__v") - lo) / width).cast("long"), F.lit(nBins - 1L))
    val counts = x.groupBy(bin.as("__bin"))
      .agg(F.sum("__ca").as("__ca"), F.sum("__cb").as("__cb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var acc = 0.0
    counts.foreach { case (_, ca, cb) =>
      val d = math.sqrt(ca.toDouble / na) - math.sqrt(cb.toDouble / nb)
      acc += d * d
    }
    (math.sqrt(acc / 2.0), na, nb)
  }
}
