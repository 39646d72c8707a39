package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Multinomial Naive Bayes over whitespace tokens — the trainable
  * document classifier whose TRAINING is itself hash-exact: the model
  * is nothing but counts (per-(class, token) occurrences, per-class
  * token totals and doc counts, vocabulary size), so unlike the
  * gradient-descent [[QualityClassifier]] the fitted model — not just
  * scoring under fixed weights — replays bit-for-bit in a SQL oracle.
  * The curation use is the CCNet/fastText slot: label a small seed by
  * language/domain/quality tier, train in one counting pass over it,
  * score the 100 TB corpus map-side-heavy.
  *
  * Exactness: log-probabilities are INTEGER-QUANTIZED —
  * `lnq(x) = floor(ln(x) · quant)` as a BIGINT — so per-document
  * accumulation is integer summation: associative, order-free, exact
  * under any partitioning, and identical in any engine (the
  * established cross-libm ln bridge, see
  * [[TextAnalysis.bm25TopDocs]]). A document's class score is
  * `lnq(nDocs_c) − lnq(nDocs) + Σ_tokens [lnq(cnt(c,t) + 1) −
  * lnq(total_c + V)]` — Laplace-smoothed multinomial NB with all
  * terms ±1e-6-quantized; the argmax is unaffected except at exact
  * integer-score ties, which break deterministically (largest class
  * label wins, mirrored in the oracle).
  *
  * Scale shape: training is one exchange (groupBy(class, token) with
  * map-side combine) plus two bounded aggregates; per-class stats
  * (#classes rows) collect to the driver and ride scoring as folded
  * literals. Scoring is explode → ONE token-keyed join against the
  * model (AQE broadcasts it while the vocabulary is small, shuffles
  * both sides keyed by token when it is not — never a driver
  * bottleneck) → ONE doc-keyed exchange summing k integer columns
  * with map-side partials. #classes must be driver-small (it becomes
  * a column fan-out); vocabulary may be arbitrarily large.
  *
  * (Reference analog: none — whylogs profiles classifier OUTPUTS
  * (§2.C); this is the classifier a training-data pipeline runs ahead
  * of them. Formulation: McCallum & Nigam 1998, multinomial event
  * model with add-one smoothing.)
  */
object NaiveBayes {

  /** `floor(ln(x) · quant)` as BIGINT — the integer-quantized log. */
  private def lnqL(x: Column, quant: Double): Column =
    F.floor(F.log(x.cast("double")) * F.lit(quant)).cast("long")

  private def toks(text: Column): Column =
    F.filter(TextAnalysis.tokens(text), w => F.length(w) > 0)

  /** Train on `train` (`textCol`, `labelCol`) and score `score`
    * (`idCol`, `textCol`): one row per scored document —
    * `(idCol, pred, score)` where `score` is the winning class's
    * quantized log-probability over `quant` (one IEEE division).
    * Empty/blank documents score on priors alone. Class labels must
    * be non-null and driver-small in number. */
  def trainScore(train: DataFrame, score: DataFrame,
      textCol: String, labelCol: String, idCol: String,
      quant: Double = 1000000.0): DataFrame = {
    val trainTok = train.select(F.col(labelCol).cast("string").as("__c"),
      F.explode(toks(F.col(textCol))).as("__t"))
    val tc = trainTok.groupBy("__c", "__t")
      .agg(F.count(F.lit(1)).as("__cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vocab = tc.select("__t").distinct().count()
      val totals = tc.groupBy("__c").agg(F.sum("__cnt").as("__total"))
      val docs = train.groupBy(F.col(labelCol).cast("string").as("__c"))
        .agg(F.count(F.lit(1)).as("__nd"))
      val stats = totals.join(docs, Seq("__c")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      require(stats.nonEmpty, "trainScore: no training documents")
      val nDocs = stats.map(_._3).sum
      // model: token -> map(class -> cnt); lookup by key, so the
      // collect_list order inside a token group is irrelevant
      val model = tc.groupBy(F.col("__t").as("tok"))
        .agg(F.map_from_entries(
          F.collect_list(F.struct(F.col("__c"), F.col("__cnt")))).as("__m"))
      val exploded = score.select(F.col(idCol),
        F.explode_outer(toks(F.col(textCol))).as("tok"))
      val joined = exploded.join(model, Seq("tok"), "left")
      // per-class integer contributions; constants fold at plan time
      val sumCols = stats.zipWithIndex.map { case ((c, total, _), i) =>
        val cnt = F.coalesce(F.element_at(F.col("__m"), F.lit(c)), F.lit(0L))
        val perTok = lnqL(cnt + F.lit(1L), quant) -
          lnqL(F.lit((total + vocab).toDouble), quant)
        F.sum(F.when(F.col("tok").isNull, F.lit(0L)).otherwise(perTok))
          .as(s"__s$i")
      }.toSeq
      val sums = joined.groupBy(F.col(idCol))
        .agg(sumCols.head, sumCols.tail: _*)
      val scored = stats.zipWithIndex.map { case ((c, _, nd), i) =>
        val prior = lnqL(F.lit(nd.toDouble), quant) -
          lnqL(F.lit(nDocs.toDouble), quant)
        F.struct((F.coalesce(F.col(s"__s$i"), F.lit(0L)) + prior).as("q"),
          F.lit(c).as("c"))
      }
      // struct max: highest score, ties to the largest class label
      val best = F.array_max(F.array(scored.toSeq: _*))
      sums.select(F.col(idCol), best.getField("c").as("pred"),
          (best.getField("q").cast("double") / F.lit(quant)).as("score"))
        .localCheckpoint(true)
    } finally { tc.unpersist(blocking = false); () }
  }
}
