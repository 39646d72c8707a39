package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions.cosine_similarity

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale design: the query set is broadcast (small side); the corpus is
  * streamed once. Top-k uses a two-phase partial/final reduction —
  * per-partition top-k, then merge — so no partition ever materializes the
  * full per-query candidate list (the same shape as Spark's own
  * TakeOrdered). The IVF variant prunes the corpus scan to `nprobe`
  * clusters, trading recall for a ~C/nprobe scan reduction.
  */
object Similarity {

  /** Per-(group) top-k without a full sort: partial top-k per partition,
    * then final merge. `score` descending. Rows: (groupCol, payload cols). */
  private def topKPerGroup(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val pair = F.struct(F.col(scoreCol), F.col(idCol))
    val partial = scored
      .groupBy(F.col(groupCol), F.spark_partition_id().as("__part"))
      .agg(F.slice(F.reverse(F.array_sort(F.collect_list(pair))), 1, k).as("top"))
    val fin = partial
      .groupBy(groupCol)
      .agg(F.slice(F.reverse(F.array_sort(F.flatten(F.collect_list(F.col("top"))))), 1, k).as("top"))
    fin.select(F.col(groupCol), F.posexplode(F.col("top")).as(Seq("rank0", "p")))
      .select(F.col(groupCol), F.col(s"p.$idCol").as(idCol),
        F.col(s"p.$scoreCol").as(scoreCol), (F.col("rank0") + 1).as("rank"))
  }

  /** Brute-force exact cosine top-k: every query against the full corpus.
    * Baseline and oracle for the approximate variants. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 5): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("score", cosine_similarity(F.col("__qv"), F.col("__cv")))
      .select("query_id", "neighbor_id", "score")
    topKPerGroup(scored, "query_id", "neighbor_id", "score", k)
  }

  /** Deterministic lightweight k-means (Lloyd) for IVF coarse quantization:
    * seeds = first `c` corpus rows by id (deterministic), `iters` update
    * steps computed with aggregations (no driver math beyond centroid
    * collection — centroid set is small by construction). */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var centroids = corpus.orderBy(idCol).limit(c)
      .select((F.row_number().over(Window.orderBy(idCol)) - 1).as("centroid_id"),
        F.col(vecCol).cast("array<double>").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignToNearest(corpus, centroids, idCol, vecCol)
      // Per-dimension mean via explode + groupBy — never materializes a
      // cell's member set on one node (cells can hold billions of rows).
      centroids = assigned
        .select(F.col("centroid_id"),
          F.posexplode(F.col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
        .groupBy("centroid_id", "dim").agg(F.avg("v").as("m"))
        .groupBy("centroid_id")
        .agg(F.expr("transform(array_sort(collect_list(struct(dim, m))), x -> x.m)")
          .as("centroid"))
    }
    centroids
  }

  /** Assign each corpus row to its nearest centroid (broadcast centroids,
    * map-only argmin). */
  def assignToNearest(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val scored = corpus.crossJoin(F.broadcast(centroids))
      .withColumn("__sim", cosine_similarity(F.col(vecCol).cast("array<double>"), F.col("centroid")))
    val best = scored.groupBy(idCol)
      .agg(F.max_by(F.col("centroid_id"), F.col("__sim")).as("centroid_id"))
    corpus.join(best, idCol)
  }

  /** IVF search: probe the `nprobe` nearest cells per query; exact cosine
    * within the probed cells only. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numCentroids: Int = 16, nprobe: Int = 4, k: Int = 5): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, numCentroids).cache()
    val assigned = assignToNearest(corpus, cents, idCol, vecCol)
      .select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"), F.col("centroid_id"))
    val qCells = queries
      .select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"))
      .crossJoin(F.broadcast(cents))
      .withColumn("__sim", cosine_similarity(F.col("__qv").cast("array<double>"), F.col("centroid")))
    val probes = topKPerGroup(
      qCells.select(F.col("query_id"), F.col("centroid_id"), F.col("__sim").as("score")),
      "query_id", "centroid_id", "score", nprobe)
      .select(F.col("query_id").as("pq"), F.col("centroid_id"))
    val qWithProbes = qCells.select("query_id", "__qv").distinct()
      .join(probes, F.col("query_id") === F.col("pq")).drop("pq")
    val scored = assigned.join(F.broadcast(qWithProbes), Seq("centroid_id"))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("score", cosine_similarity(F.col("__qv"), F.col("__cv")))
      .select("query_id", "neighbor_id", "score")
      .dropDuplicates("query_id", "neighbor_id")
    topKPerGroup(scored, "query_id", "neighbor_id", "score", k)
  }
}
