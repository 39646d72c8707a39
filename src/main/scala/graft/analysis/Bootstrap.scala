package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deterministic Poisson bootstrap — distributed confidence intervals
  * with NO random state: the classic Poisson bootstrap (each row joins
  * replicate b with multiplicity ~ Poisson(1) — the big-data
  * reformulation of resampling-with-replacement, used because a
  * distributed engine cannot sample n-out-of-n globally) driven by a
  * HASH instead of an RNG. Each (row id, replicate) pair hashes
  * through md5 to a uniform in [0,1), which an inverse-CDF CASE over
  * fixed cumulative-Poisson(1) literal thresholds turns into the
  * multiplicity — fully deterministic, partitioning-invariant, and
  * SQL-replayable (md5 and the threshold literals are identical in
  * every engine; no engine RNG is ever consulted).
  *
  * Exactness: per replicate, `Σ mult·v` and `Σ mult` accumulate as
  * BIGINTs over integer-valued `v` (ANSI-loud past 2⁶³); each
  * replicate mean is ONE IEEE divide; the CI bounds are exact order
  * statistics of the B bounded replicate means. The multiplicity tail
  * is clamped at 9 (P ≈ 1.1e-6 per pair — a fixed part of the
  * estimator's definition, not a silent approximation).
  *
  * Scale shape: ONE scan with a 64-way per-row explode that collapses
  * map-side into B groups (partial aggregation — the exchange carries
  * B rows per partition), then order statistics over B driver rows.
  * At 100 TB this is one pass, shuffle bytes independent of row count.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF at k = 0..8 — fixed literals shared
    * with the SQL mirror (never recomputed via exp/factorial at run
    * time, so there is nothing to diverge). */
  val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402)

  /** Uniform in [0,1) from (id, replicate): the first 8 hex chars of
    * `md5(id:rep)` over 2³². */
  def hashUniform(id: Column, rep: Column): Column =
    F.conv(F.substring(F.md5(F.concat(id.cast("string"), F.lit(":"),
      rep.cast("string"))), 1, 8), 16, 10).cast("long").cast("double") /
      F.lit(4294967296.0)

  /** Poisson(1) multiplicity via the inverse CDF over [[poissonCdf]]. */
  def poissonMult(u: Column): Column =
    poissonCdf.zipWithIndex.foldRight(F.lit(9L): Column) {
      case ((t, k), rest) => F.when(u < t, k.toLong).otherwise(rest)
    }

  /** Bootstrap CI for the MEAN of an integer-valued column:
    * one row `(n, mean, b, lo_rep, hi_rep, ci_lo, ci_hi)` where
    * `ci_lo`/`ci_hi` are the `floor(b·loRank)`-th / `floor(b·hiRank)`-th
    * (0-based) order statistics of the B replicate means (default the
    * 2.5%/97.5% band of B = 64 replicates: indices 1 and 62). Rows
    * with NULL id or value drop. */
  def meanCI(df: DataFrame, idCol: String, valueCol: String, b: Int = 64,
      loRank: Double = 0.025, hiRank: Double = 0.975): DataFrame = {
    require(b >= 4, "need at least 4 replicates")
    require(loRank >= 0 && loRank < hiRank && hiRank <= 1, "bad rank band")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .filter(F.col(idCol).isNotNull && F.col(valueCol).isNotNull)
      .select(F.col(idCol).cast("string").as("__id"),
        F.col(valueCol).cast("long").as("__v"))
    val reps = base
      .select(F.col("__id"), F.col("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).as("__b"))
      .withColumn("__m", poissonMult(hashUniform(F.col("__id"), F.col("__b"))))
      .groupBy("__b")
      .agg(F.sum(F.col("__m") * F.col("__v")).as("__s"),
        F.sum("__m").as("__c"))
      .select((F.col("__s").cast("double") / F.col("__c").cast("double"))
        .as("__mean"))
      .collect().map(_.getDouble(0)).sorted
    require(reps.length == b, s"expected $b replicates, got ${reps.length}")
    val loIdx = math.floor(b * loRank).toInt
    val hiIdx = math.min(math.floor(b * hiRank).toInt, b - 1)
    base.agg(F.count(F.lit(1)).as("n"),
        (F.sum("__v").cast("double") / F.count(F.lit(1)).cast("double"))
          .as("mean"))
      .select(F.col("n"), F.col("mean"), F.lit(b.toLong).as("b"),
        F.lit(reps.head).as("lo_rep"), F.lit(reps.last).as("hi_rep"),
        F.lit(reps(loIdx)).as("ci_lo"), F.lit(reps(hiIdx)).as("ci_hi"))
  }

  /** Exact two-proportion z-test — the A/B readout over event streams:
    * `z = (p1 − p2) / √(p̂(1−p̂)(1/n1 + 1/n2))` with every count an
    * exact BIGINT and the z one fixed IEEE tree (NULL when an arm is
    * empty or the pooled rate is degenerate). `armCol` must be a
    * boolean "is arm 1" split; `successCol` a boolean outcome. */
  def proportionTest(df: DataFrame, armCol: Column, successCol: Column): DataFrame = {
    val agg = df
      .filter(armCol.isNotNull && successCol.isNotNull)
      .agg(
        F.sum(F.when(armCol, 1L).otherwise(0L)).as("n1"),
        F.sum(F.when(armCol && successCol, 1L).otherwise(0L)).as("c1"),
        F.sum(F.when(!armCol, 1L).otherwise(0L)).as("n2"),
        F.sum(F.when(!armCol && successCol, 1L).otherwise(0L)).as("c2"))
    val p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    val p2 = F.col("c2").cast("double") / F.col("n2").cast("double")
    val pp = (F.col("c1") + F.col("c2")).cast("double") /
      (F.col("n1") + F.col("n2")).cast("double")
    val se = F.sqrt(pp * (F.lit(1.0) - pp) *
      (F.lit(1.0) / F.col("n1").cast("double") +
        F.lit(1.0) / F.col("n2").cast("double")))
    agg.select(F.col("n1"), F.col("c1"), F.col("n2"), F.col("c2"),
      p1.as("p1"), p2.as("p2"),
      F.when(F.col("n1") === 0L || F.col("n2") === 0L ||
          pp === 0.0 || pp === 1.0, F.lit(null).cast("double"))
        .otherwise((p1 - p2) / se).as("z"))
  }
}
