package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Streaming drift monitoring against a STATIC reference distribution —
  * the online half of the drift suite (reference
  * `viz/drift/configs.py` thresholds territory; the reference itself has
  * no streaming monitor, so this is a completion in the same family as
  * [[DedupStream]]): freeze a bin envelope on the reference (training)
  * data in batch, then score each event-time window of the live stream
  * with PSI over those FROZEN bins — the standard model-monitoring
  * configuration, where bin edges must not drift with the data they
  * judge.
  *
  * Scale shape: bin assignment is a map-only codegen'd expression (the
  * envelope rides along as literals, not a join); the windowed count is
  * an ordinary partial/final streaming aggregation whose state is
  * ≤ nBins rows per open window; the PSI fold is a distributed
  * `aggregate()` over a `sequence(0, nBins-1)` literal — ascending-bin,
  * so the float accumulation order is deterministic and engine-exact
  * (matches the DuckDB oracle's `sum(... ORDER BY bin)`), with NO
  * driver-side collect anywhere.
  */
object DriftStream {

  /** Frozen reference histogram: `[lo, lo+width·nBins)` fixed-width bins
    * with the reference's per-bin counts. Out-of-envelope live values
    * clamp into the edge bins (drift INTO the tails must score, not
    * vanish). */
  final case class BinEnvelope(
      lo: Double, width: Double, nBins: Int,
      refCounts: Array[Long], nRef: Long) {
    require(nBins > 0 && refCounts.length == nBins && nRef > 0,
      s"malformed envelope: nBins=$nBins counts=${refCounts.length} nRef=$nRef")
  }

  /** Batch pass over the reference data: (min, max) envelope + per-bin
    * counts. Driver receives ≤ nBins+1 rows. A degenerate single-value
    * reference gets width 1 so the live stream still bins (everything
    * clamps around the point mass). */
  def referenceEnvelope(
      ref: DataFrame, valueCol: String, nBins: Int = 30): BinEnvelope = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val v = F.col(valueCol).cast("double")
    val Array(mm) = ref.filter(v.isNotNull)
      .agg(F.min(v).as("lo"), F.max(v).as("hi"), F.count(v).as("n")).collect()
    require(!mm.isNullAt(2) && mm.getLong(2) > 0, "empty reference data")
    val (lo, hi, n) = (mm.getDouble(0), mm.getDouble(1), mm.getLong(2))
    val width = if (hi > lo) (hi - lo) / nBins else 1.0
    val counts = Array.ofDim[Long](nBins)
    ref.filter(v.isNotNull)
      .select(binOf(v, lo, width, nBins).as("bin"))
      .groupBy("bin").agg(F.count(F.lit(1)).as("c"))
      .collect().foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    BinEnvelope(lo, width, nBins, counts, n)
  }

  /** Clamped fixed-width bin id — pure arithmetic, codegen'd. */
  private def binOf(v: Column, lo: Double, width: Double, nBins: Int): Column =
    F.least(F.greatest(
      F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0L)), F.lit(nBins - 1L))

  /** Per-(window, bin) counts of a streaming (or batch) frame against the
    * frozen envelope. Streaming-legal: map-only projection + one windowed
    * aggregation (complete/update mode, or append with a watermark). */
  def windowedBinCounts(
      sdf: DataFrame, tsCol: String, windowDuration: String,
      valueCol: String, env: BinEnvelope,
      watermark: Option[String] = None): DataFrame = {
    val v = F.col(valueCol).cast("double")
    val withWm = watermark.map(w => sdf.withWatermark(tsCol, w)).getOrElse(sdf)
    withWm.filter(v.isNotNull)
      .select(F.window(F.col(tsCol), windowDuration).as("window"),
        binOf(v, env.lo, env.width, env.nBins).as("bin"))
      .groupBy("window", "bin").agg(F.count(F.lit(1)).as("c"))
  }

  /** Fold (window, bin, c) rows into one PSI score per window vs the
    * envelope's reference proportions (both sides floored at `eps`, the
    * conventional smoothing). Bins with mass on only one side still
    * contribute: the fold walks ALL nBins bins via `sequence`, reading
    * the window's counts from a map. Distributed and deterministic —
    * the only shuffle is the groupBy(window). */
  def psiPerWindow(
      binCounts: DataFrame, env: BinEnvelope,
      eps: Double = 1e-4): DataFrame = {
    val refProps = F.array(env.refCounts.map(c =>
      F.lit(math.max(c.toDouble / env.nRef, eps))): _*)
    val cntMap = F.map_from_entries(
      F.collect_list(F.struct(F.col("bin"), F.col("c"))))
    binCounts
      .groupBy("window")
      .agg(F.sum("c").as("n_target"), cntMap.as("__m"))
      .select(
        F.col("window"),
        F.aggregate(
          F.sequence(F.lit(0), F.lit(env.nBins - 1)), F.lit(0.0),
          (acc, b) => {
            val ca = F.coalesce(
              F.element_at(F.col("__m"), b.cast("long")), F.lit(0L))
            val pa = F.greatest(
              ca.cast("double") / F.col("n_target").cast("double"), F.lit(eps))
            val pb = F.element_at(refProps, b + F.lit(1))
            acc + (pa - pb) * F.log(pa / pb)
          }).as("psi"),
        F.col("n_target"))
  }

  /** Per-window Jensen–Shannon divergence vs the envelope's reference
    * proportions — the symmetric, ln2-bounded companion to
    * [[psiPerWindow]], needing no eps floor (a bin empty on one side
    * contributes only the live side's term). Same fold shape: all
    * nBins bins walked via `sequence` in ascending order, counts read
    * from a map, one groupBy(window) shuffle. ln is floored at 1e-9
    * (the cross-libm bridge), so a SQL oracle replays the fold
    * bit-for-bit — no output rounding needed. */
  def jsdPerWindow(binCounts: DataFrame, env: BinEnvelope): DataFrame = {
    def lnq(x: Column): Column =
      F.floor(F.log(x) * F.lit(1e9)).cast("double") / F.lit(1e9)
    val refProps = F.array(env.refCounts.map(c =>
      F.lit(c.toDouble / env.nRef)): _*)
    val cntMap = F.map_from_entries(
      F.collect_list(F.struct(F.col("bin"), F.col("c"))))
    binCounts
      .groupBy("window")
      .agg(F.sum("c").as("n_target"), cntMap.as("__m"))
      .select(
        F.col("window"),
        F.aggregate(
          F.sequence(F.lit(0), F.lit(env.nBins - 1)), F.lit(0.0),
          (acc, b) => {
            val ca = F.coalesce(
              F.element_at(F.col("__m"), b.cast("long")), F.lit(0L))
            val pa = ca.cast("double") / F.col("n_target").cast("double")
            val pb = F.element_at(refProps, b + F.lit(1))
            val m = (pa + pb) / F.lit(2)
            val ta = F.when(pa > 0, F.lit(0.5) * (pa * lnq(pa / m))).otherwise(0.0)
            val tb = F.when(pb > 0, F.lit(0.5) * (pb * lnq(pb / m))).otherwise(0.0)
            acc + (ta + tb)
          }).as("jsd"),
        F.col("n_target"))
  }

  /** Per-window normalized grid EMD (Wasserstein-1) vs the envelope's
    * reference histogram: Σ over bins of |cdf_live − cdf_ref| / nBins.
    * INTEGER cumulative counts cross-multiplied (`cumLive·nRef −
    * cumRef·nLive`) until one final division — like
    * [[graft.analysis.DriftExact.emdStats]], no libm or float-order
    * caveats at all, so a SQL oracle replays it bit-for-bit. The fold
    * walks all nBins in order; one groupBy(window) shuffle.
    *
    * Scale bound (mirrors emdStats): the cross-product `cum · nRef`
    * wraps Long silently past nRef · n_target ≈ 2⁶³ under Spark's
    * default non-ANSI arithmetic — keep each side under ~3e9 rows. A
    * complete-mode window accumulates n_target unboundedly, so
    * long-running monitors should watermark (append mode) or rotate
    * the reference envelope rather than let one window grow without
    * limit. */
  def emdPerWindow(binCounts: DataFrame, env: BinEnvelope): DataFrame = {
    val refCum: Array[Long] = env.refCounts.scanLeft(0L)(_ + _).tail
    val refCumCol = F.array(refCum.map(F.lit(_)): _*)
    val cntMap = F.map_from_entries(
      F.collect_list(F.struct(F.col("bin"), F.col("c"))))
    binCounts
      .groupBy("window")
      .agg(F.sum("c").as("n_target"), cntMap.as("__m"))
      .select(
        F.col("window"),
        (F.aggregate(
          F.sequence(F.lit(0), F.lit(env.nBins - 1)),
          F.struct(F.lit(0L).as("cum"), F.lit(0L).as("acc")),
          (st, b) => {
            val ca = F.coalesce(
              F.element_at(F.col("__m"), b.cast("long")), F.lit(0L))
            val cum = st.getField("cum") + ca
            val gap = F.abs(cum * F.lit(env.nRef) -
              F.element_at(refCumCol, b + F.lit(1)) * F.col("n_target"))
            F.struct(cum.as("cum"), (st.getField("acc") + gap).as("acc"))
          }).getField("acc").cast("double") /
          (F.col("n_target").cast("double") * F.lit(env.nRef.toDouble) *
            F.lit(env.nBins.toDouble))).as("emd"),
        F.col("n_target"))
  }

  /** The composed monitor: frame → frozen-bin counts → per-window PSI.
    * Composes directly on a BATCH frame (backfill / replay parity). A
    * streaming query can't chain two stateful aggregations, so live
    * streams run [[windowedBinCounts]] as the streaming query and apply
    * [[psiPerWindow]] on each emission (foreachBatch or the sink table)
    * — that second step is a KB-scale fold over ≤ nBins rows per
    * window, exactly what the driver-free composition does here. */
  def monitor(
      sdf: DataFrame, tsCol: String, windowDuration: String,
      valueCol: String, env: BinEnvelope,
      watermark: Option[String] = None, eps: Double = 1e-4): DataFrame =
    psiPerWindow(
      windowedBinCounts(sdf, tsCol, windowDuration, valueCol, env, watermark),
      env, eps)
}
