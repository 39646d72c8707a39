package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions.{cosine_similarity, top_k_agg}

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

  /** Per-group top-k via the bounded-heap aggregate: every partial and
    * final buffer holds at most k entries (TakeOrdered's shape), so no
    * partition ever materializes a per-query candidate list. Ordering:
    * (score desc, id desc), ties broken deterministically. */
  private def topKPerGroup(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val fin = scored.groupBy(groupCol)
      .agg(top_k_agg(F.col(scoreCol), F.col(idCol).cast("long"), k).as("top"))
    fin.select(F.col(groupCol), F.posexplode(F.col("top")).as(Seq("rank0", "p")))
      .select(F.col(groupCol), F.col("p.id").as(idCol),
        F.col("p.score").as(scoreCol), (F.col("rank0") + 1).as("rank"))
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

  /** Centroid-set literal: array<struct<cid int, centroid array<double>>>.
    * The centroid set is tiny by construction (numCentroids × dim doubles),
    * so shipping it as an expression literal makes every per-row centroid
    * computation map-only — no broadcast-join, no shuffle. */
  private def centroidLiteral(cents: Array[(Int, Array[Double])]): Column =
    F.array(cents.map { case (cid, vec) =>
      F.struct(F.lit(cid).as("cid"), F.typedLit(vec.toSeq).as("centroid"))
    }.toIndexedSeq: _*)

  /** Nearest-centroid id per row: argmax over the literal centroid array
    * with a fold — codegen'd, map-only. Ties go to the lowest cid. */
  def nearestCentroidId(vec: Column, cents: Array[(Int, Array[Double])]): Column = {
    val v = vec.cast("array<double>")
    // Both CASE branches cast to an identical named struct type — field
    // aliases inside lambda bodies don't survive analysis.
    val accType = "struct<s:double,cid:int>"
    F.aggregate(
      centroidLiteral(cents),
      F.struct(F.lit(Double.NegativeInfinity).as("s"), F.lit(-1).as("cid")).cast(accType),
      (acc, x) => {
        val sim = cosine_similarity(v, x.getField("centroid"))
        F.when(sim > acc.getField("s"),
          F.struct(sim, x.getField("cid")).cast(accType)).otherwise(acc)
      },
      acc => acc.getField("cid"))
  }

  /** The `nprobe` nearest centroid ids per row, as an array — sorting a
    * c-element literal-derived array per row (c = numCentroids, small). */
  def nearestCentroidIds(vec: Column, cents: Array[(Int, Array[Double])], nprobe: Int): Column = {
    val v = vec.cast("array<double>")
    val scored = F.transform(centroidLiteral(cents),
      x => F.struct(cosine_similarity(v, x.getField("centroid")).as("s"),
        x.getField("cid").as("cid")))
    F.transform(F.slice(F.reverse(F.array_sort(scored)), 1, nprobe), x => x.getField("cid"))
  }

  /** Deterministic lightweight k-means (Lloyd) for IVF coarse quantization:
    * seeds = first `c` corpus rows by id. Each iteration is one map-only
    * assignment pass + a per-dimension explode/groupBy mean (never
    * materializes a cell's member set on one node); only the c centroid
    * rows themselves are collected to the driver. */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int = 2): Array[(Int, Array[Double])] = {
    var cents: Array[(Int, Array[Double])] =
      corpus.orderBy(idCol).limit(c)
        .select(F.col(vecCol).cast("array<double>").as("centroid"))
        .collect().zipWithIndex.map { case (r, i) =>
          i -> r.getAs[scala.collection.Seq[Double]]("centroid").toArray
        }
    for (_ <- 0 until iters) {
      cents = corpus
        .select(nearestCentroidId(F.col(vecCol), cents).as("centroid_id"),
          F.posexplode(F.col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
        .groupBy("centroid_id", "dim").agg(F.avg("v").as("m"))
        .groupBy("centroid_id")
        .agg(F.expr("transform(array_sort(collect_list(struct(dim, m))), x -> x.m)")
          .as("centroid"))
        .collect().map { r =>
          r.getAs[Int]("centroid_id") ->
            r.getAs[scala.collection.Seq[Double]]("centroid").toArray
        }.sortBy(_._1)
    }
    cents
  }

  /** IVF search: probe the `nprobe` nearest cells per query; exact cosine
    * within the probed cells only. One corpus scan after training: map-only
    * cell assignment, broadcast-join against (query × probe), then the
    * bounded top-k aggregate — a single shuffle on query_id. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numCentroids: Int = 16, nprobe: Int = 4, k: Int = 5): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, numCentroids)
    val assigned = corpus.select(F.col(idCol).as("neighbor_id"),
      F.col(vecCol).as("__cv"),
      nearestCentroidId(F.col(vecCol), cents).as("centroid_id"))
    val qWithProbes = queries
      .select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
        F.explode(nearestCentroidIds(F.col(vecCol), cents, nprobe)).as("centroid_id"))
    val scored = assigned.join(F.broadcast(qWithProbes), Seq("centroid_id"))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("score", cosine_similarity(F.col("__qv"), F.col("__cv")))
      .select("query_id", "neighbor_id", "score")
    topKPerGroup(scored, "query_id", "neighbor_id", "score", k)
  }
}
