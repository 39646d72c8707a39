package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.core.MetricConfig
import graft.functions._
import graft.profile.ColumnProfileView

/** EmbeddingMetric (reference
  * `experimental/extras/embedding_metric.py:52-207`): a MultiMetric over
  * an embedding column given labeled reference vectors — per label a
  * distribution of (cosine) distances from every logged vector to that
  * label's reference, plus a `closest` submetric counting which label is
  * nearest (argmin distance, ties to the first label).
  *
  * Spark shape: references ship as expression literals (tiny by
  * construction), distances and the argmin label are map-only column
  * expressions, and the whole metric is one `df.agg` — the same single
  * partial/final pass as every other profile metric.
  */
object Embeddings {

  /** Cosine distance (sklearn `cosine_distances` = 1 − cosine similarity). */
  def cosineDistance(v: Column, ref: Column): Column =
    F.lit(1.0) - cosine_similarity(v, ref)

  private def distances(vec: Column, refs: Seq[(String, Array[Double])]): Seq[(String, Column)] = {
    val v = vec.cast("array<double>")
    refs.map { case (label, rv) =>
      label -> cosineDistance(v, F.typedLit(rv.toSeq))
    }
  }

  /** Label of the nearest reference (argmin distance, first label wins
    * ties) — a fold over the distances, map-only. */
  def closestLabel(vec: Column, refs: Seq[(String, Array[Double])]): Column = {
    val ds = distances(vec, refs)
    ds.tail.foldLeft((ds.head._2, F.lit(ds.head._1))) { case ((bestD, bestL), (label, d)) =>
      (F.when(d < bestD, d).otherwise(bestD),
        F.when(d < bestD, F.lit(label)).otherwise(bestL))
    }._2
  }

  /** The MultiMetric aggregate struct: one `<label>_distance` bundle per
    * reference + the `closest` bundle. */
  def aggColumn(vec: Column, refs: Seq[(String, Array[Double])],
      config: MetricConfig = MetricConfig()): Column = {
    val distBundles = distances(vec, refs).map { case (label, d) =>
      F.struct(
        F.struct(F.count(d).as("n"), count_where(vec.isNull).as("nulls"),
          F.lit(0L).as("nan"), F.lit(0L).as("inf"), F.lit(0L).as("trueCount")).as("counts"),
        distribution_agg(d, config.kllK, config.quantiles).as("distribution"),
        cardinality_agg(d, config.hllLgK, config.numStdDev).as("cardinality")
      ).as(s"${label}_distance")
    }
    val closest = {
      val cl = F.when(vec.isNotNull, closestLabel(vec, refs))
      F.struct(
        F.struct(F.count(cl).as("n"), count_where(vec.isNull).as("nulls"),
          F.lit(0L).as("nan"), F.lit(0L).as("inf"), F.lit(0L).as("trueCount")).as("counts"),
        frequent_items_agg(cl, config.fiLgMaxK, config.fiLimit).as("frequent_items"),
        cardinality_agg(cl, config.hllLgK, config.numStdDev).as("cardinality")
      ).as("closest")
    }
    F.struct(distBundles :+ closest: _*).as("embedding")
  }

  /** Collected MultiMetric view: submetric name → standard bundle under
    * namespace "embedding". */
  def profile(df: DataFrame, vecCol: String, refs: Seq[(String, Array[Double])],
      config: MetricConfig = MetricConfig()): ColumnProfileView = {
    val row = df.agg(aggColumn(F.col(vecCol), refs, config)).collect()(0)
    val ur = row.getStruct(0)
    val subs = ur.schema.fieldNames.map { n =>
      n -> graft.api.Profiler.parseBundle(ur.getAs[org.apache.spark.sql.Row](n), config.quantiles)
    }.toMap
    ColumnProfileView(subMetrics = Map("embedding" -> subs))
  }

  /** First `n` corpus vectors as labeled references ("ref0".."refN-1"),
    * the deterministic default used by tests and the registered query. */
  def referencesFromCorpus(df: DataFrame, idCol: String, vecCol: String, n: Int): Seq[(String, Array[Double])] =
    df.orderBy(idCol).limit(n)
      .select(F.col(vecCol).cast("array<double>"))
      .collect().zipWithIndex.map { case (r, i) =>
        s"ref$i" -> r.getAs[scala.collection.Seq[Double]](0).toArray
      }.toSeq

  /** Unsupervised reference selector (reference
    * `experimental/preprocess/embeddings/selectors.py` KMeansSelector):
    * Lloyd centroids trained on the same bounded driver-side sample as
    * IVF coarse quantization ([[Similarity.trainCentroids]]), labeled
    * "cluster_<i>". Deterministic: fixed seeds, fixed sample order. */
  def kmeansReferences(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2, sampleSize: Int = 4096): Seq[(String, Array[Double])] =
    Similarity.trainCentroids(df, idCol, vecCol, k, iters, sampleSize)
      .map { case (i, v) => s"cluster_$i" -> v }.toSeq

  /** Supervised reference selector (reference `selectors.py`
    * PCACentroidsSelector): one reference per label. Computed DISTRIBUTED
    * as the exact per-label mean vector — one explode plus one
    * map-side-combined groupBy((label, position)) exchange of
    * labels × dim cells; no driver-side matrix, so it works at any corpus
    * size FOR BOUNDED LABEL CARDINALITY — the collect is labels × dim
    * cells, so `maxLabels` guards against an id-like column passed as
    * labelCol (the [[graft.analysis.DriftExact.chi2Stats]] hazard).
    * DOCUMENTED DIVERGENCE: the reference computes centroids in a
    * low-dim PCA projection (optionally percentile-trimmed) and
    * inverse-transforms back — an artifact of its single-machine sklearn
    * path whose round trip lands near the raw mean anyway; the exact
    * raw-space label centroid is the scale-robust equivalent. */
  def labeledReferences(
      df: DataFrame, vecCol: String, labelCol: String,
      maxLabels: Int = 10000): Seq[(String, Array[Double])] = {
    val dim = df.select(F.size(F.col(vecCol)).as("__d"))
      .filter(F.col("__d") > 0).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    val cells = df
      .filter(F.col(vecCol).isNotNull && F.col(labelCol).isNotNull)
      .select(F.col(labelCol).cast("string").as("__l"),
        F.posexplode(F.col(vecCol).cast("array<double>")).as(Seq("__pos", "__x")))
      .groupBy("__l", "__pos").agg(F.avg("__x").as("__m"))
      .take(maxLabels * math.max(dim, 1) + 1)
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    require(cells.length <= maxLabels * math.max(dim, 1),
      s"more than $maxLabels distinct labels in '$labelCol': not a label " +
        "column — pass a bounded-cardinality column or raise maxLabels")
    cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, cs) =>
      l -> cs.sortBy(_._2).map(_._3).toArray
    }
  }

  // ------------------------------------------------------------------
  // PCA reference selectors (reference
  // `experimental/preprocess/embeddings/selectors.py:22-105`)

  /** A fitted PCA basis: the per-dimension mean plus `k` principal axes
    * (each length `dim`). Projection/inverse live on the driver only for
    * KB-scale reference math; bulk projection rides as column
    * expressions ([[pcaProjection]]). */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]]) {
    def k: Int = components.length
    def project(x: Array[Double]): Array[Double] =
      components.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += (x(i) - mean(i)) * c(i); i += 1 }
        s
      }
    def inverse(z: Array[Double]): Array[Double] = {
      val out = mean.clone()
      var j = 0
      while (j < components.length) {
        val c = components(j); var i = 0
        while (i < c.length) { out(i) += z(j) * c(i); i += 1 }
        j += 1
      }
      out
    }
    /** Orthogonal projection onto the principal subspace, in raw space —
      * sklearn's `inverse_transform(transform(x))`, sign-invariant. */
    def roundTrip(x: Array[Double]): Array[Double] = inverse(project(x))
  }

  /** Fit PCA DISTRIBUTED (reference `selectors.py` uses driver-side
    * sklearn `PCA.fit` — a non-starter at corpus scale): per-dimension
    * means via one posexplode hash-agg, principal axes via
    * `RowMatrix.computePrincipalComponents` (one treeAggregate Gramian
    * pass; its covariance step centers internally, so rows ship raw).
    * The dim×dim covariance lands on the driver, bounding this to
    * dim ≲ 10k — embedding WIDTHS, never row counts. */
  def fitPca(df: DataFrame, vecCol: String, nComponents: Int): PcaModel = {
    val clean = df.filter(F.col(vecCol).isNotNull)
      .select(F.col(vecCol).cast("array<double>").as("__v"))
    val mean = clean
      .select(F.posexplode(F.col("__v")).as(Seq("__p", "__x")))
      .groupBy("__p").agg(F.avg("__x").as("__m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    require(mean.nonEmpty, s"no non-null vectors in '$vecCol'")
    require(nComponents >= 1 && nComponents <= mean.length,
      s"nComponents must be in [1, ${mean.length}], got $nComponents")
    import org.apache.spark.mllib.linalg.{Vectors => MlVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = clean.rdd.map(r =>
      MlVectors.dense(r.getAs[scala.collection.Seq[Double]](0).toArray))
    val pc = new RowMatrix(rows).computePrincipalComponents(nComponents)
    PcaModel(mean,
      Array.tabulate(nComponents)(j => Array.tabulate(mean.length)(i => pc(i, j))))
  }

  /** The k projection coordinates of `vec` as map-only column
    * expressions: dot(v, c_j) via zip_with/aggregate minus the
    * precomputed dot(mean, c_j) — the model ships as literals (KB). */
  def pcaProjection(vec: Column, model: PcaModel): Seq[Column] = {
    val v = vec.cast("array<double>")
    model.components.map { c =>
      var const = 0.0
      var i = 0
      while (i < c.length) { const += model.mean(i) * c(i); i += 1 }
      F.aggregate(
        F.zip_with(v, F.typedLit(c.toSeq), (a, b) => a * b),
        F.lit(0.0), (acc, x) => acc + x) - F.lit(const)
    }
  }

  /** Supervised PCA selector (reference `PCACentroidsSelector`,
    * `selectors.py:22-58`): per-label centroids in PCA space,
    * inverse-transformed back to raw space.
    *
    * Untrimmed (the reference default, both limits 0): projection is
    * linear, so the PCA-space label centroid IS the projection of the
    * raw label centroid — one [[labeledReferences]] pass plus a driver
    * round-trip, no per-row projection at all. With percentile limits
    * set, the trim breaks linearity: vectors project map-only
    * ([[pcaProjection]]), per-(label, component) exact-percentile bounds
    * come from one grouped pass and broadcast back, and the trimmed mean
    * is a second grouped pass — both exchanges carry labels × k cells.
    * DOCUMENTED DIVERGENCE: the reference trims on percentiles of the
    * FLATTENED per-label matrix and its elementwise mask collapses the
    * array to 1-D (the per-label "centroid" degenerates to a scalar) —
    * a bug we do not reproduce; we trim per component, which is the
    * evident intent. An all-trimmed (label, component) cell falls back
    * to its untrimmed mean rather than NaN. */
  def pcaCentroidReferences(
      df: DataFrame, vecCol: String, labelCol: String,
      nComponents: Int = 2,
      lowerPercentile: Double = 0.0, upperPercentile: Double = 0.0,
      maxLabels: Int = 10000): Seq[(String, Array[Double])] = {
    val model = fitPca(df, vecCol, nComponents)
    if (lowerPercentile == 0.0 && upperPercentile == 0.0)
      labeledReferences(df, vecCol, labelCol, maxLabels)
        .map { case (l, c) => l -> model.roundTrip(c) }
    else {
      require(lowerPercentile >= 0.0 && upperPercentile <= 100.0 &&
        lowerPercentile < upperPercentile,
        s"percentile limits must satisfy 0 <= lower < upper <= 100, " +
          s"got ($lowerPercentile, $upperPercentile)")
      val proj = df
        .filter(F.col(vecCol).isNotNull && F.col(labelCol).isNotNull)
        .select(F.col(labelCol).cast("string").as("__l"),
          F.posexplode(F.array(pcaProjection(F.col(vecCol), model): _*))
            .as(Seq("__c", "__z")))
      val bounds = proj.groupBy("__l", "__c").agg(
        F.expr(s"percentile(__z, ${lowerPercentile / 100.0})").as("__lo"),
        F.expr(s"percentile(__z, ${upperPercentile / 100.0})").as("__hi"))
      val cells = proj.join(F.broadcast(bounds), Seq("__l", "__c"))
        .groupBy("__l", "__c")
        .agg(F.coalesce(
          F.avg(F.when(F.col("__z") > F.col("__lo") &&
            F.col("__z") < F.col("__hi"), F.col("__z"))),
          F.avg(F.col("__z"))).as("__m"))
        .take(maxLabels * nComponents + 1)
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      require(cells.length <= maxLabels * nComponents,
        s"more than $maxLabels distinct labels in '$labelCol': not a label " +
          "column — pass a bounded-cardinality column or raise maxLabels")
      cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, cs) =>
        l -> model.inverse(cs.sortBy(_._2).map(_._3).toArray)
      }
    }
  }

  /** Unsupervised PCA selector (reference `PCAKMeansSelector`,
    * `selectors.py:82-105`): Lloyd centroids trained in the k-dim PCA
    * projection, inverse-transformed to raw space. Projection is
    * map-only; clustering reuses [[Similarity.trainCentroids]]'s
    * bounded-sample Lloyd (deterministic: fixed sample order and seeds;
    * cosine assignment, the same documented divergence from sklearn's
    * Euclidean k-means as [[kmeansReferences]]). */
  def pcaKmeansReferences(
      df: DataFrame, idCol: String, vecCol: String, nClusters: Int,
      nComponents: Int = 2, iters: Int = 2,
      sampleSize: Int = 4096): Seq[(String, Array[Double])] = {
    val model = fitPca(df, vecCol, nComponents)
    val projected = df
      .filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol),
        F.array(pcaProjection(F.col(vecCol), model): _*).as("__z"))
    Similarity.trainCentroids(projected, idCol, "__z", nClusters, iters, sampleSize)
      .map { case (i, z) => s"cluster_$i" -> model.inverse(z) }.toSeq
  }

  /** Per-dimension centroid drift between a target and a reference slice
    * of one embedding column — the first lens of embedding-distribution
    * monitoring (the reference's EmbeddingMetric profiles distances to
    * fixed refs; comparing two SLICES of a corpus is the drift half the
    * product docs describe but the library never shipped).
    *
    * Scale shape: `posexplode` is a map-side ×dim fanout collapsed by
    * hash aggregation with map-side partials — the exchange carries at
    * most `dim` rows per upstream partition, and nothing is ever
    * collected. Output: one row per dimension with per-side counts and
    * means (raw doubles; callers needing cross-engine bit-parity round,
    * since a distributed float sum is order-sensitive). */
  def centroidDrift(df: DataFrame, vecCol: String, isTarget: Column): DataFrame = {
    val t = isTarget
    df.filter(F.col(vecCol).isNotNull)
      .select(t.as("__t"),
        F.posexplode(F.col(vecCol).cast("array<double>")).as(Seq("dim", "__v")))
      .groupBy("dim").agg(
        F.count(F.when(F.col("__t"), 1)).as("n_target"),
        F.count(F.when(!F.col("__t"), 1)).as("n_ref"),
        F.sum(F.when(F.col("__t"), F.col("__v"))).as("__st"),
        F.sum(F.when(!F.col("__t"), F.col("__v"))).as("__sr"))
      .select(F.col("dim"), F.col("n_target"), F.col("n_ref"),
        (F.col("__st") / F.col("n_target")).as("mean_target"),
        (F.col("__sr") / F.col("n_ref")).as("mean_ref"))
  }

  /** Pairwise class-centroid separation: for every label pair (a < b)
    * the cosine similarity and L2 distance between the two class
    * centroids — the compactness/confusability audit for labeled
    * embedding corpora (low inter-class distance flags label noise or
    * collapsed representations).
    *
    * Exactness: per-dim means are rounded to `roundDecimals` (identical
    * on both engines), then every downstream op folds in ascending dim
    * order over the collected ≤dim array — the [[centroidShift]] recipe
    * extended per label.
    *
    * Scale: the ×dim fanout collapses via map-side partials into
    * |labels|·dim rows; the pairwise join is over |labels| rows (one
    * per class — KB-scale by construction), so the quadratic part never
    * touches data volume. */
  def classSeparation(df: DataFrame, vecCol: String, labelCol: String,
      roundDecimals: Int = 6): DataFrame = {
    val base = df.filter(F.col(labelCol).isNotNull && F.col(vecCol).isNotNull)
    val perDim = base
      .select(F.col(labelCol).as("label"),
        F.posexplode(F.col(vecCol).cast("array<double>")).as(Seq("dim", "__v")))
      .groupBy("label", "dim")
      .agg(F.count(F.lit(1)).as("__n"), F.sum("__v").as("__s"))
      .select(F.col("label"), F.col("dim"),
        F.round(F.col("__s") / F.col("__n"), roundDecimals).as("__m"))
    val cents = perDim.groupBy("label")
      .agg(F.array_sort(F.collect_list(
        F.struct(F.col("dim"), F.col("__m")))).as("__c0"))
      .select(F.col("label"),
        F.transform(F.col("__c0"), x => x.getField("__m")).as("__c"))
    val counts = base.groupBy(F.col(labelCol).as("label"))
      .agg(F.count(F.lit(1)).as("n"))
    val withN = cents.join(counts, "label")
    val a = withN.select(F.col("label").as("label_a"), F.col("n").as("n_a"),
      F.col("__c").as("__ca"))
    val b = withN.select(F.col("label").as("label_b"), F.col("n").as("n_b"),
      F.col("__c").as("__cb"))
    def fold(c: Column) = F.aggregate(c, F.lit(0.0), (acc, x) => acc + x)
    val dot = fold(F.zip_with(F.col("__ca"), F.col("__cb"), (x, y) => x * y))
    val qa = fold(F.transform(F.col("__ca"), x => x * x))
    val qb = fold(F.transform(F.col("__cb"), x => x * x))
    val d2 = fold(F.zip_with(F.col("__ca"), F.col("__cb"),
      (x, y) => (x - y) * (x - y)))
    a.join(b, F.col("label_a") < F.col("label_b"))
      .select(F.col("label_a"), F.col("label_b"), F.col("n_a"), F.col("n_b"),
        (dot / (F.sqrt(qa) * F.sqrt(qb))).as("cos_sim"),
        F.sqrt(d2).as("l2_dist"))
  }

  /** Per-row L2 norm of a vector column — the fold runs in array order
    * with a 0.0 seed, so the double accumulation is deterministic and
    * engine-exact (0.0 + x² ≡ x² in IEEE for the non-negative squares). */
  def l2Norm(vecCol: Column): Column =
    F.sqrt(F.aggregate(vecCol.cast("array<double>"), F.lit(0.0),
      (acc, x) => acc + x * x))

  /** Collapse a [[centroidDrift]] frame into one summary row: cosine
    * similarity and L2 distance between the two centroids. The fold walks
    * dimensions in ascending order over a collected ≤dim-element array
    * (KB-scale by construction), so the float accumulation order is
    * deterministic and engine-exact — no driver collect, one row out. */
  def centroidShift(drift: DataFrame): DataFrame = {
    val arr = F.sort_array(F.collect_list(
      F.struct(F.col("dim"), F.col("mean_target").as("mt"),
        F.col("mean_ref").as("mr"))))
    def fold(term: (Column, Column) => Column): Column =
      F.aggregate(F.col("__a"), F.lit(0.0),
        (acc, x) => acc + term(x.getField("mt"), x.getField("mr")))
    drift.agg(arr.as("__a"),
        F.max("n_target").as("n_target"), F.max("n_ref").as("n_ref"))
      .select(
        (fold((a, b) => a * b) /
          (F.sqrt(fold((a, _) => a * a)) * F.sqrt(fold((_, b) => b * b))))
          .as("cos_shift"),
        F.sqrt(fold((a, b) => (a - b) * (a - b))).as("l2_shift"),
        F.col("n_target"), F.col("n_ref"))
  }
}
