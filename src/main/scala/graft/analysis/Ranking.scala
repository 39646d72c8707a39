package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.sql.{functions => F}

/** Batch ranking / recommender-evaluation metrics — the Spark analog of
  * the reference's `log_batch_ranking_metrics`
  * (`experimental/api/logger/__init__.py:158-374`, row-wise cores
  * `:20-133`): recall@k, precision@k, average precision@k, NDCG@k,
  * sum-gain@k, top rank and reciprocal rank (MRR when averaged), per
  * row over array columns.
  *
  * Input modes (same dispatch as the reference):
  *  - '''prediction + target''' — numeric: `prediction[i]` is the
  *    predicted RANK of domain element `i` (a 1..n permutation) and
  *    `target[i]` its true relevance (number or bool, truthy =
  *    relevant); or string: `prediction` is the ranked item list and
  *    `target` the relevant-item list (`convert_non_numeric` mode).
  *  - '''target + score''' — `score[i]` is the model output for element
  *    `i`; ranks derive as `argsort(argsort(-score)) + 1` with ties
  *    broken by list position (numpy's stable argsort, reference
  *    `:294-296`).
  *  - '''target only''' — `target` holds relevances already in
  *    prediction order; ranks are `1..n` (reference `:283-309`).
  *
  * Every metric is a per-row expression over `functions` higher-order
  * array ops (`zip_with`/`filter`/`transform`/`aggregate`/`array_sort`)
  * — map-only, no UDF, no shuffle; profiling or segmenting the result
  * is whatever aggregation the caller composes on top. The optional
  * k-clamp (reference `:319-326` clamps k to the longest prediction
  * list) costs one narrow pre-pass over array sizes; pass an explicit
  * `clampK = false` to skip it at scale when k is known valid.
  *
  * Permutation note: numeric mode takes "sort pairs by rank, take the
  * first k" (reference `:37-40`) as "rank value ≤ k", which coincides
  * exactly when `prediction` is a 1..n permutation — the same
  * assumption the reference's `list.index(k)` makes (`:57`).
  */
object Ranking {

  private def truthy(t: Column): Column = t =!= 0.0

  private def log2(c: Column): Column = F.log(2.0, c)

  /** Stable dense ranks from a score array: rank 1 = highest score,
    * equal scores rank by list position (numpy stable argsort). O(n log
    * n) per row via two comparator sorts, not the O(n²) pairwise count.
    * NaN scores rank LAST (worst), matching the reference's
    * `np.argsort(argsort(-score))` where `-NaN = NaN` sorts to the end
    * — without the explicit branch the `<`/`>` comparator is
    * non-transitive on NaN and the sort order would be undefined.
    */
  def ranksFromScores(scores: Column): Column = {
    val zi = F.transform(scores,
      (x, i) => F.struct(x.cast("double").as("s"), i.as("i")))
    val sorted = F.array_sort(zi, (a, b) => {
      val an = F.isnan(a.getField("s")) || a.getField("s").isNull
      val bn = F.isnan(b.getField("s")) || b.getField("s").isNull
      F.when(an && !bn, F.lit(1))
        .when(!an && bn, F.lit(-1))
        .when(a.getField("s") > b.getField("s"), F.lit(-1))
        .when(a.getField("s") < b.getField("s"), F.lit(1))
        .otherwise(a.getField("i") - b.getField("i"))
    })
    // invert the permutation: (original index, rank), sorted by index
    val byIdx = F.array_sort(F.transform(sorted, (z, pos) =>
      F.struct(z.getField("i").as("i"), (pos + 1).cast("long").as("r"))))
    F.transform(byIdx, _.getField("r"))
  }

  /** Ranks `1..n` for target-only mode (relevances already in
    * prediction order). */
  def indexRanks(target: Column): Column =
    F.when(F.size(target) === 0, F.array().cast("array<long>"))
      .otherwise(F.sequence(F.lit(1L), F.size(target).cast("long")))

  /** All per-row metrics for NUMERIC mode as one struct column. `pred`:
    * array of 1..n ranks; `target`: array of relevances aligned by
    * domain element. Fields: count_at_k, count_all, top_rank, recall,
    * precision, average_precision, ndcg, sum_gain, reciprocal_rank. */
  def numericRow(pred: Column, target: Column, k: Int): Column = {
    val z = F.zip_with(pred, target,
      (a, b) => F.struct(a.cast("long").as("p"), b.cast("double").as("t")))
    val rel = F.filter(z, e => truthy(e.getField("t")))
    val countAll = F.size(rel).cast("long")
    val inK = F.filter(z, e => e.getField("p") <= k)
    val countAtK = F.size(F.filter(rel, e => e.getField("p") <= k)).cast("long")
    val topRank = F.array_min(F.transform(rel, _.getField("p")))
    // AP: mean of precision@r over relevant ranks r ≤ k; the sorted
    // relevant-rank list rr gives precision@rr[i] = (i+1)/rr[i]
    val rr = F.array_sort(F.transform(
      F.filter(rel, e => e.getField("p") <= k), _.getField("p")))
    val apSum = F.aggregate(
      F.transform(rr, (r, i) => (i + 1).cast("double") / r),
      F.lit(0.0), _ + _)
    val ap = F.when(F.size(rr) === 0, 0.0).otherwise(apSum / F.size(rr))
    val dcg = F.aggregate(inK, F.lit(0.0), (acc, e) =>
      acc + F.coalesce(e.getField("t"), F.lit(0.0)) /
        log2(e.getField("p") + F.lit(1L)))
    val idcg = F.aggregate(
      F.transform(F.slice(F.sort_array(target.cast("array<double>"),
        asc = false), 1, k),
        (v, i) => F.coalesce(v, F.lit(0.0)) / log2((i + 2).cast("double"))),
      F.lit(0.0), _ + _)
    val ndcg = F.when(idcg.isNull || idcg === 0.0, 1.0).otherwise(dcg / idcg)
    val sumGain = F.aggregate(inK, F.lit(0.0),
      (acc, e) => acc + F.coalesce(e.getField("t"), F.lit(0.0)))
    F.struct(
      countAtK.as("count_at_k"), countAll.as("count_all"),
      topRank.as("top_rank"),
      F.when(countAll === 0, F.lit(null).cast("double"))
        .otherwise(countAtK.cast("double") / countAll).as("recall"),
      (countAtK.cast("double") / k).as("precision"),
      ap.as("average_precision"), ndcg.as("ndcg"), sumGain.as("sum_gain"),
      F.coalesce(F.lit(1.0) / topRank, F.lit(0.0)).as("reciprocal_rank"))
  }

  /** All per-row metrics for STRING mode (the reference's
    * `convert_non_numeric`): `pred` is the ranked item list, `target`
    * the relevant-item list; relevance is membership. Same struct
    * fields as [[numericRow]]. */
  def stringRow(pred: Column, target: Column, k: Int): Column = {
    // 1-based positions (ascending) of predictions that hit the target
    val positions = F.filter(
      F.transform(pred, (x, i) =>
        F.when(F.array_contains(target, x), (i + 1).cast("long"))),
      _.isNotNull)
    val countAll = F.size(positions).cast("long")
    val posK = F.filter(positions, _ <= k)
    val countAtK = F.size(posK).cast("long")
    val topRank = F.array_min(positions)
    val apSum = F.aggregate(
      F.transform(posK, (r, i) => (i + 1).cast("double") / r),
      F.lit(0.0), _ + _)
    val ap = F.when(F.size(posK) === 0, 0.0).otherwise(apSum / F.size(posK))
    // reference calc_non_numeric_relevance: predicted relevance is the
    // 0/1 hit list in prediction order; ideal relevance additionally
    // counts target items absent from the prediction, sorted desc
    val dcg = F.aggregate(
      F.transform(F.slice(pred, 1, k), (x, i) =>
        F.when(F.array_contains(target, x),
          F.lit(1.0) / log2((i + 2).cast("double"))).otherwise(0.0)),
      F.lit(0.0), _ + _)
    val nOnes = countAll +
      F.size(F.filter(target, x => !F.array_contains(pred, x))).cast("long")
    val idcgN = F.least(F.lit(k.toLong), nOnes)
    val idcg = F.when(idcgN <= 0, 0.0).otherwise(F.aggregate(
      F.transform(F.sequence(F.lit(1L), idcgN),
        i => F.lit(1.0) / log2((i + 1).cast("double"))),
      F.lit(0.0), _ + _))
    val ndcg = F.when(idcg === 0.0, 1.0).otherwise(dcg / idcg)
    F.struct(
      countAtK.as("count_at_k"), countAll.as("count_all"),
      topRank.as("top_rank"),
      F.when(countAll === 0, F.lit(null).cast("double"))
        .otherwise(countAtK.cast("double") / countAll).as("recall"),
      (countAtK.cast("double") / k).as("precision"),
      ap.as("average_precision"), ndcg.as("ndcg"),
      countAtK.cast("double").as("sum_gain"),
      F.coalesce(F.lit(1.0) / topRank, F.lit(0.0)).as("reciprocal_rank"))
  }

  private def isStringArray(df: DataFrame, col: String): Boolean =
    df.schema(col).dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }

  /** The `log_batch_ranking_metrics` analog: appends the reference's
    * output columns (`recall_k_{k}`, `precision_k_{k}`, `top_rank`,
    * `average_precision_k_{k}`, `norm_dis_cumul_gain_k_{k}`,
    * `sum_gain_k_{k}`, `reciprocal_rank`) to `df`. Exactly one of the
    * reference's input modes must be given; `k = None` (or a k above
    * the longest prediction list, when `clampK`) clamps to the max
    * list length at the cost of one narrow pre-pass. */
  def logBatchRankingMetrics(
      df: DataFrame,
      predictionCol: Option[String] = None,
      targetCol: Option[String] = None,
      scoreCol: Option[String] = None,
      k: Option[Int] = None,
      clampK: Boolean = true): DataFrame = {
    require(scoreCol.isEmpty || predictionCol.isEmpty,
      "cannot specify both scoreCol and predictionCol")
    require(predictionCol.nonEmpty || targetCol.nonEmpty,
      "either targetCol or scoreCol+targetCol or predictionCol must be given")
    k.foreach(kk => require(kk >= 1, s"k must be a positive integer: $kk"))
    // reference :283-287 — target alone means relevance-in-prediction-
    // order; :302-309 — prediction alone means the same thing
    val orderOnly = (predictionCol.toSeq ++ targetCol.toSeq ++ scoreCol.toSeq)
      .size == 1 && scoreCol.isEmpty
    val (pred, tgt, stringMode, lenCol) =
      if (orderOnly) {
        val c = predictionCol.orElse(targetCol).get
        (indexRanks(F.col(c)), F.col(c).cast("array<double>"), false, c)
      } else if (scoreCol.nonEmpty) {
        // string targets (or scores) would cast to all-null arrays and
        // silently zero every metric; the reference raises on misuse
        require(!isStringArray(df, targetCol.get) &&
          !isStringArray(df, scoreCol.get),
          "score mode needs numeric target and score arrays; got a " +
            "string array — use prediction+target string mode for items")
        (ranksFromScores(F.col(scoreCol.get)),
          F.col(targetCol.get).cast("array<double>"), false, scoreCol.get)
      } else if (isStringArray(df, predictionCol.get) &&
          isStringArray(df, targetCol.get)) {
        (F.col(predictionCol.get), F.col(targetCol.get), true,
          predictionCol.get)
      } else {
        require(!isStringArray(df, predictionCol.get) &&
          !isStringArray(df, targetCol.get),
          s"mixed ranking input types: ${predictionCol.get} and " +
            s"${targetCol.get} must be both string arrays (item mode) or " +
            "both numeric arrays (rank/relevance mode)")
        (F.col(predictionCol.get), F.col(targetCol.get).cast("array<double>"),
          false, predictionCol.get)
      }
    val kk = if (k.isEmpty || clampK) {
      val aggRow = df.agg(F.max(F.size(F.col(lenCol)))).head
      require(!aggRow.isNullAt(0),
        "ranking metrics need at least one row with a non-null list")
      val maxK = aggRow.getInt(0)
      require(maxK >= 1, "ranking metrics on empty lists only")
      math.min(k.getOrElse(maxK), maxK)
    } else k.get
    // the seven appended names are the output contract; a colliding
    // input column would be silently overwritten and then dropped by
    // the facade's "new columns only" selection (same reserved-name
    // stance as AsofJoin)
    val outNames = Seq(s"recall_k_$kk", s"precision_k_$kk", "top_rank",
      s"average_precision_k_$kk", s"norm_dis_cumul_gain_k_$kk",
      s"sum_gain_k_$kk", "reciprocal_rank", "__rank_m")
    val clashes = outNames.filter(df.columns.contains)
    require(clashes.isEmpty,
      s"input columns collide with ranking metric outputs: " +
        s"${clashes.mkString(", ")} — rename them before logging")
    val m = if (stringMode) stringRow(pred, tgt, kk) else numericRow(pred, tgt, kk)
    df.withColumn("__rank_m", m)
      .withColumn(s"recall_k_$kk", F.col("__rank_m.recall"))
      .withColumn(s"precision_k_$kk", F.col("__rank_m.precision"))
      .withColumn("top_rank", F.col("__rank_m.top_rank"))
      .withColumn(s"average_precision_k_$kk",
        F.col("__rank_m.average_precision"))
      .withColumn(s"norm_dis_cumul_gain_k_$kk", F.col("__rank_m.ndcg"))
      .withColumn(s"sum_gain_k_$kk", F.col("__rank_m.sum_gain"))
      .withColumn("reciprocal_rank", F.col("__rank_m.reciprocal_rank"))
      .drop("__rank_m")
  }
}
