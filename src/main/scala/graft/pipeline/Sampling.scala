package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deterministic (hash-threshold) sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected set changes
  * with partitioning, task retries, and engine version — unacceptable
  * when a 100 TB corpus must be re-derivable bit-for-bit. Hash-threshold
  * sampling instead keeps a row iff the leading 32 bits of
  * md5(salt ":" key) fall under ⌊p·2³²⌋: map-only (no shuffle, no RNG
  * state), stable under any partitioning, and consistent ACROSS datasets
  * — every table sharing the key samples the same entities, which is how
  * you sample a user's rows from all of their tables at once. The salt
  * decorrelates independent samples over the same keys.
  *
  * All comparisons are on the md5 hex string (lowercase, fixed 8 chars),
  * so any engine with md5() reproduces the exact row set — the DuckDB
  * oracles run the identical predicate.
  *
  * NULL keys hash to NULL and are never sampled (documented; coalesce
  * the key first if NULLs must participate).
  */
object Sampling {

  /** Leading 8 hex chars (32 bits) of md5(salt ":" key). */
  def sampleHash(key: Column, salt: String): Column =
    F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8)

  /** Lowercase-hex threshold for fraction `p`: keep iff hash < this.
    * p ≥ 1 returns "g", lexicographically above every hex digit. */
  def thresholdHex(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"fraction out of [0,1]: $p")
    val t = math.round(p * 4294967296.0)
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** Uniform deterministic sample at rate `fraction`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(sampleHash(key, salt) < F.lit(thresholdHex(fraction)))

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample
    * the head language, keep the tail), `defaultFraction` for strata not
    * listed (and NULL strata). One map-only pass — the when-chain
    * compiles to codegen'd branches, no join, no shuffle. */
  def stratifiedHashSample(df: DataFrame, key: Column, strata: Column,
      fractions: Map[String, Double], defaultFraction: Double,
      salt: String = ""): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldRight(
      F.lit(thresholdHex(defaultFraction)): Column) { case ((k, p), acc) =>
      F.when(strata === F.lit(k), F.lit(thresholdHex(p))).otherwise(acc)
    }
    df.filter(sampleHash(key, salt) < thr)
  }

  /** Balance strata to the SMALLEST stratum's size (the α→0 limit of
    * temperature-scaled language sampling, mT5 §3.1 territory): keep a
    * row iff `md5int(key) % n_s < n_min`, i.e. stratum `s` survives at
    * rate n_min/n_s — pure integer arithmetic, so the selected set is
    * bit-reproducible in any engine with md5 (no pow(), whose last-ulp
    * rounding could flip a threshold). Two scans: a map-side-combined
    * stratum-count pass whose ≤ `maxStrata` rows come to the driver
    * (guarded — an id-like strata column fails fast instead of OOMing),
    * then a map-only filter with the counts on a broadcast join. The
    * modulo bias is ≤ n_s/2⁶⁰ — unmeasurable at any corpus size.
    * NULL strata are dropped (they have no count row). */
  def balancedSample(df: DataFrame, key: Column, strata: Column,
      salt: String = "", maxStrata: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NULL strata are excluded from the counts too — a small null group
    // must not drag nMin (and so every stratum's rate) down when its own
    // rows are dropped by the join anyway.
    val counts = df.filter(strata.isNotNull)
      .groupBy(strata.as("__s")).agg(F.count(F.lit(1)).as("__n"))
      .select(F.col("__s").cast("string"), F.col("__n"))
      .take(maxStrata + 1)
    require(counts.length <= maxStrata,
      s"more than $maxStrata strata: not a stratum column — pass a " +
        "bounded-cardinality column or raise maxStrata")
    require(counts.nonEmpty, "balancedSample on an empty dataset")
    val nMin = counts.map(_.getLong(1)).min
    val meta = F.broadcast(counts.map(r => (r.getString(0), r.getLong(1)))
      .toSeq.toDF("__s2", "__n"))
    // 15 hex chars = 60 bits — fits a long with headroom
    val h = F.conv(F.substring(
      F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 15),
      16, 10).cast("long")
    df.join(meta, strata.cast("string") === F.col("__s2"))
      .filter(h % F.col("__n") < F.lit(nMin))
      .drop("__s2", "__n")
  }

  /** Temperature-scaled stratum sampling (the mT5 §3.1 / XLM-R language
    *-balancing family): stratum `s` survives at rate (n_min/n_s)^α —
    * α=0 keeps everything, α=1 is [[balancedSample]], and intermediate α
    * damps the head without flattening it (α≈0.3–0.7 in practice).
    * Selection is `md5int(key) % n_s < thr_s` with the per-stratum
    * threshold `thr_s = ⌊(n_min/n_s)^α · n_s⌋` computed ONCE driver-side
    * from the ≤ `maxStrata` collected counts (guarded like
    * [[balancedSample]]) — so the data-path stays pure integer
    * arithmetic and the selected set is engine-reproducible. At α=0.5
    * the threshold itself is also bit-reproducible (√ is IEEE
    * correctly-rounded); for other α the pow() may differ by 1 ulp
    * across engines, which flips a threshold only when
    * (n_min/n_s)^α·n_s is within an ulp of an integer. α=1 shortcuts to
    * the exact n_min. */
  def temperatureSample(df: DataFrame, key: Column, strata: Column,
      alpha: Double = 0.5, salt: String = "",
      maxStrata: Int = 10000): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL strata excluded from counts for the same reason as in
    // balancedSample: they carry no surviving rows.
    val counts = df.filter(strata.isNotNull)
      .groupBy(strata.as("__s")).agg(F.count(F.lit(1)).as("__n"))
      .select(F.col("__s").cast("string"), F.col("__n"))
      .take(maxStrata + 1)
    require(counts.length <= maxStrata,
      s"more than $maxStrata strata: not a stratum column — pass a " +
        "bounded-cardinality column or raise maxStrata")
    require(counts.nonEmpty, "temperatureSample on an empty dataset")
    val nMin = counts.map(_.getLong(1)).min
    val meta = F.broadcast(counts.map { r =>
      val n = r.getLong(1)
      val thr =
        if (alpha == 1.0) nMin
        else if (alpha == 0.0) n
        // explicit sqrt at α=0.5: correctly-rounded everywhere, unlike
        // pow(x, 0.5) whose 1-ulp licence engines spend differently
        else if (alpha == 0.5)
          math.floor(math.sqrt(nMin.toDouble / n) * n).toLong
        else math.floor(math.pow(nMin.toDouble / n, alpha) * n).toLong
      (r.getString(0), n, thr)
    }.toSeq.toDF("__s2", "__n", "__thr"))
    val h = F.conv(F.substring(
      F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 15),
      16, 10).cast("long")
    df.join(meta, strata.cast("string") === F.col("__s2"))
      .filter(h % F.col("__n") < F.col("__thr"))
      .drop("__s2", "__n", "__thr")
  }

  /** Deterministic dataset split (train/val/test …): assigns each key a
    * label by cumulative hash range. Weights are normalized; the last
    * split absorbs the rounding tail. Same key + salt ⇒ same split on
    * every run and engine, the property that keeps eval sets leak-free
    * across pipeline re-builds. */
  def hashSplit(key: Column, salt: String, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) && splits.map(_._2).sum > 0,
      "splits must be non-empty with non-negative weights and positive sum")
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val h = sampleHash(key, salt)
    // thresholds ascending; the final otherwise catches the rounding tail
    splits.init.zip(cum.init).foldRight(F.lit(splits.last._1): Column) {
      case (((name, _), c), acc) =>
        F.when(h < F.lit(thresholdHex(c)), F.lit(name)).otherwise(acc)
    }
  }

  /** Deterministic corpus shuffle + sharding — the reproducible global
    * ordering a training run reads its data in. Every row gets a
    * `shard` (which output file/worker stream it belongs to) and a
    * `pos` (its position within that shard); both derive solely from
    * md5(salt:key), so any engine — or a re-run years later — derives
    * the identical permutation. Shard comes from hex chars 9–12 of the
    * digest and the within-shard order from chars 1–8, so placement and
    * order use disjoint digest bits.
    *
    * Precondition: `key` must be UNIQUE (a row id, like [[capPerKey]]'s
    * `rowId`) — duplicate keys share both digest and tie-break, so
    * their relative `pos` would be assigned arbitrarily per run and
    * partitioning, breaking the identical-permutation guarantee.
    *
    * Scale shape: ONE hash exchange on `shard` + a within-partition
    * sort (the window never sees more than a shard); size `numShards`
    * to the target file/stream count — corpus/numShards rows per shard
    * is the sort bound, so at 100 TB that means thousands of shards,
    * not eight — and each sort stays executor-local and bounded. No
    * global sort, no driver state. */
  def deterministicShuffle(df: DataFrame, key: Column, numShards: Int,
      salt: String = "shuffle"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val digest = F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))
    val shard = F.pmod(
      F.conv(F.substring(digest, 9, 4), 16, 10).cast("int"), F.lit(numShards))
    val orderKey = F.substring(digest, 1, 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("shard")).orderBy(F.col("__ord").asc, key.asc)
    df.withColumn("shard", shard)
      .withColumn("__ord", orderKey)
      .withColumn("pos", F.row_number().over(w).cast("long"))
      .drop("__ord")
  }

  /** Domain balancing: keep at most `cap` rows per key (the Common-Crawl
    * "max pages per domain" rule — unchecked, boilerplate-heavy domains
    * otherwise dominate a crawl corpus). Selection is a deterministic
    * uniform draw, not head-of-table: rows rank within their key by
    * (md5 hash of the row id, id) and ranks ≤ cap survive — stable under
    * any partitioning and engine, and re-salting redraws the survivor
    * set.
    *
    * Scale shape: ONE exchange on the key; the per-key window sort is
    * bounded by the largest key's row count (a domain, not the corpus).
    * When a corpus has pathological mega-keys and an exact cap is not
    * required, prefer [[stratifiedHashSample]] with per-key rates
    * cap/count — map-only after a count pass, approximate cap. */
  def capPerKey(df: DataFrame, key: Column, rowId: Column, cap: Int,
      salt: String = "cap"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(sampleHash(rowId, salt).asc, rowId.asc)
    df.withColumn("__rk", F.row_number().over(w))
      .filter(F.col("__rk") <= cap)
      .drop("__rk")
  }

  /** Token-budget mixture planning — the data-mixing table of an LLM
    * pretraining run: each listed domain should contribute
    * `target_share` of the token budget, and no domain may be repeated
    * more than `maxEpochs` times. Per domain present in the data:
    *
    *   - `tokens`: available tokens (sum of `weight`)
    *   - `target_share`: the normalized requested share
    *   - `budget_tokens`: share × budget
    *   - `rate`: budget_tokens / tokens, clipped at `maxEpochs` —
    *     feed this straight into [[applyMixture]] (>1 upsamples)
    *   - `capped`: whether the epoch cap clipped the request
    *
    * With `budget = None` the LARGEST feasible budget is used —
    * min over domains of tokens·maxEpochs / share, the point where the
    * most-stretched domain hits its epoch cap (so exactly one domain
    * has rate = maxEpochs and nothing is capped short of target).
    *
    * Scale shape: one map-side-combined groupBy over the listed
    * domains' rows (the result is ≤ |targets| rows); the feasible
    * budget is a broadcast min over that tiny table — no corpus-sized
    * state anywhere. Domains listed in `targets` but ABSENT from the
    * data are absent from the output (and do not constrain the
    * feasible budget). */
  def mixtureWeights(df: DataFrame, domain: Column, weight: Column,
      targets: Map[String, Double], budget: Option[Double] = None,
      maxEpochs: Double = 4.0): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0), s"target shares must be > 0: $targets")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    require(budget.forall(_ > 0), s"budget must be > 0: $budget")
    val total = targets.values.sum
    val shareCol = targets.toSeq.sortBy(_._1)
      .foldRight(F.lit(null).cast("double"): Column) { case ((k, w), acc) =>
        F.when(F.col("__dom") === k, F.lit(w / total)).otherwise(acc)
      }
    val stats = df
      .select(domain.cast("string").as("__dom"), weight.cast("double").as("__w"))
      .filter(F.col("__dom").isInCollection(targets.keys.toSeq))
      .groupBy("__dom").agg(F.sum(F.col("__w")).as("tokens"))
      .withColumn("target_share", shareCol)
    val withBudget = budget match {
      case Some(b) => stats.withColumn("budget_total", F.lit(b))
      case None =>
        val feasible = stats.agg(
          F.min(F.col("tokens") * maxEpochs / F.col("target_share"))
            .as("budget_total"))
        stats.crossJoin(F.broadcast(feasible))
    }
    withBudget
      .withColumn("budget_tokens", F.col("target_share") * F.col("budget_total"))
      .withColumn("__rate_raw", F.col("budget_tokens") / F.col("tokens"))
      .select(F.col("__dom").as("domain"), F.col("tokens"),
        F.col("target_share"), F.col("budget_tokens"),
        F.least(F.col("__rate_raw"), F.lit(maxEpochs)).as("rate"),
        (F.col("__rate_raw") > F.lit(maxEpochs)).as("capped"))
  }

  /** Apply a per-domain mixture rate (from [[mixtureWeights]] or by
    * hand): rate r emits ⌊r⌋ full copies of every row plus one partial
    * copy kept at the fractional rate — deterministic hash-threshold
    * selection like everything else here, so the mixed corpus is
    * re-derivable bit-for-bit on any engine with md5. Output rows carry
    * `epochCol` (0-based copy index): rate 2.4 yields epochs {0,1} for
    * every row and epoch 2 for a hash-chosen 40%.
    *
    * Map-only: the explode factor is ⌈r⌉ per domain — no shuffle, no
    * RNG state; the per-epoch salt decorrelates the partial-copy draws
    * from each other and from other samples of the same keys. Domains
    * not listed get `defaultRate` (1.0 = pass through unchanged; 0
    * drops). NULL keys hash to NULL and never survive a partial copy
    * (same contract as [[hashSample]]). */
  def applyMixture(df: DataFrame, domain: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix", epochCol: String = "epoch"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0),
      s"rates must be >= 0: $rates default=$defaultRate")
    val d = domain.cast("string")
    def chain(f: Double => Column): Column =
      rates.toSeq.sortBy(_._1).foldRight(f(defaultRate)) { case ((k, r), acc) =>
        F.when(d === k, f(r)).otherwise(acc)
      }
    // candidate epochs: max(⌈r⌉, 1) — the rate-0 candidate is filtered
    // below (threshold "00000000" admits nothing)
    val ccCol = chain(r => F.lit(math.max(math.ceil(r).toInt, 1)))
    val fullCol = chain(r => F.lit(math.floor(r).toInt))
    val thrCol = chain(r => F.lit(thresholdHex(
      math.min(math.max(r - math.floor(r), 0.0), 1.0))))
    val h = F.substring(F.md5(F.concat(
      F.lit(salt + ":"), F.col(epochCol).cast("string"),
      F.lit(":"), key.cast("string"))), 1, 8)
    df.withColumn(epochCol, F.explode(F.sequence(F.lit(0), ccCol - 1)))
      .filter(F.col(epochCol) < fullCol || h < thrCol)
  }

  /** Deterministic size-BALANCED shard assignment — the training-shard
    * planning step: spread a corpus over `numShards` output shards so
    * per-shard total weight (token count) comes out near-equal, without
    * a global data-scale sort or unbounded driver state.
    *
    * Two-tier design, because indivisible outliers are what break
    * balance (a few 100k-token docs among millions of 500-token ones):
    *
    *  1. The `topK` heaviest docs (exact distributed top-k on (weight
    *     desc, id asc), default 8 x numShards — bounded by SHARDS, not
    *     data) are dealt by GLOBAL serpentine (0,1,...,S-1,S-1,...,1,0):
    *     each 2S-block pairs its largest with its smallest. The rank
    *     window sees only topK rows.
    *  2. Every other doc is dealt over per-shard DEFICIT QUOTAS: shard
    *     s receives tail weight proportional to max(0, grandTotal/S −
    *     topWeight_s), so shards that drew heavy outliers get
    *     proportionally less tail — the counterweight no equal-count
    *     dealing can provide. The dealing position is a golden-ratio
    *     rotation of the doc's rank within `saltGroups` md5-salted
    *     groups (ranked by weight desc): a LOW-DISCREPANCY sequence,
    *     so consecutive similar-weight docs sweep the quota buckets
    *     evenly and per-group counts are off by at most one doc per
    *     bucket — far tighter than an independent uniform draw's
    *     sqrt(n) noise. The only data-scale sort is the per-group rank
    *     window, bounded by corpus/saltGroups rows (set `saltGroups`
    *     to thousands at 100 TB, like [[deterministicShuffle]]).
    *
    * All arithmetic is engine-replayable: quotas are numShards-scaled
    * INTEGER deficits (exact, summation-order-free), each threshold is
    * one correctly-rounded integer division, and the rotation is pure
    * 64-bit integer arithmetic — a SQL oracle replays every assignment
    * bit-for-bit. NOTE: this function
    * is EAGER (it runs two small aggregate jobs to compute top-k
    * totals before returning the plan); quota thresholds are embedded
    * as plan literals.
    *
    * Output: input columns + `shard` (0-based int). Deterministic
    * under any partitioning; `id` must be unique and non-NULL. */
  def balancedShards(df: DataFrame, id: Column, weight: Column,
      numShards: Int, topK: Int = -1, saltGroups: Int = 64,
      salt: String = "shard"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(saltGroups >= 1, s"saltGroups must be >= 1, got $saltGroups")
    val k = if (topK >= 0) topK else 8 * numShards
    val slim = df.select(id.as("__id"), weight.cast("long").as("__w"))
    val wTop = org.apache.spark.sql.expressions.Window
      .orderBy(F.col("__w").desc, F.col("__id").asc)
    val cycle = (F.row_number().over(wTop) - 1) % (2 * numShards)
    // the single-partition window is bounded by topK rows (post-limit)
    val topA = slim.orderBy(F.col("__w").desc, F.col("__id").asc).limit(k)
      .withColumn("__tshard",
        F.when(cycle < numShards, cycle)
          .otherwise(F.lit(2 * numShards - 1) - cycle).cast("int"))
    // quota inputs: numShards + 1 driver-side values, never data-scale
    val topTotals: Map[Int, Long] = topA.groupBy("__tshard")
      .agg(F.sum("__w").as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val grand: Long = slim.agg(F.sum("__w")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    // deficits scaled by numShards stay INTEGER (proportions unchanged):
    // the quota fold is exact and order-free, and the one float op per
    // threshold is a single correctly-rounded division — engine-portable
    val deficits = (0 until numShards)
      .map(s => math.max(0L, grand - numShards.toLong * topTotals.getOrElse(s, 0L)))
    val cum = deficits.scanLeft(0L)(_ + _).tail
    val qsum = if (cum.last == 0L) 1L else cum.last // 0 only when tail empty
    val marked = df.join(
      F.broadcast(topA.select(F.col("__id"), F.col("__tshard"))),
      id <=> F.col("__id"), "left")
    // tail: rank within bounded salt groups by (weight desc, id), then a
    // golden-ratio rotation of the rank (Knuth 2654435761/2^32, plus a
    // per-group phase) gives a LOW-DISCREPANCY deterministic position in
    // [0, 1): consecutive (similar-weight) ranks sweep the quota buckets
    // evenly, so per-(group, shard) counts differ by at most one doc per
    // quota bucket — far below the sqrt(n) noise of an independent draw
    val grp = F.pmod(
      F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"), id.cast("string"))), 1, 7), 16, 10)
        .cast("long"),
      F.lit(saltGroups.toLong))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("__grp")).orderBy(weight.cast("long").desc, id.asc)
    val r0 = (F.row_number().over(wg) - 1).cast("long")
    val u = F.pmod(r0 * F.lit(2654435761L) + F.col("__grp") * F.lit(1013904223L),
      F.lit(4294967296L)).cast("double") / F.lit(4294967296.0)
    // first shard whose cumulative quota exceeds the rotation position
    val tailShard = (0 until numShards - 1).foldRight(
      F.lit(numShards - 1): Column) { (s, acc) =>
      F.when(u < F.lit(cum(s).toDouble / qsum.toDouble), s).otherwise(acc)
    }
    val top = marked.filter(F.col("__tshard").isNotNull)
      .withColumn("shard", F.col("__tshard"))
    val rest = marked.filter(F.col("__tshard").isNull)
      .withColumn("__grp", grp)
      .withColumn("shard", tailShard.cast("int"))
      .drop("__grp")
    top.unionByName(rest).drop("__id", "__tshard")
  }
}
