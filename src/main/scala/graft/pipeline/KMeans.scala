package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** FIXED-POINT k-means training — the trainable family's clustering
  * member: Lloyd's algorithm over integer-quantized vectors, so the
  * ENTIRE training run (assignments, centroid updates, inertia) is
  * bit-reproducible under any partitioning and replays in SQL as
  * unrolled iteration CTEs — the property float k-means (MLlib
  * included) cannot give, because float centroid sums depend on fold
  * order. The quantized model is what a curation pipeline wants from
  * k-means anyway (IVF coarse quantizers, SemDeDup cluster maps,
  * reference-profile selectors): cluster geometry, not float polish.
  *
  * Determinism contract, mirrored expression-for-expression by the
  * oracle:
  *  - quantize: `q = floor(double(v) * scale)` per dimension (exact
  *    BIGINTs thereafter);
  *  - init: the k vectors with the SMALLEST ids, in id order;
  *  - assign: argmin of the integer squared L2 distance, ties to the
  *    lowest centroid index;
  *  - update: per-dimension `floor(sum / n)` (the one double divide —
  *    exact while |sum| < 2⁵³, i.e. any realistic corpus since
  *    members·scale·|v| per cluster stays far below it); an EMPTY
  *    cluster keeps its previous centroid.
  *
  * Scale shape per iteration: the k×dim centroid table rides the plan
  * as one literal (model-sized, like [[NaiveBayes.NbModel]] but k·dim
  * bounded — enforced), distances are a map-only codegen'd
  * zip_with/aggregate over each row, and the update is ONE
  * map-side-combined groupBy(cluster, dim) whose k·dim partial sums
  * are the only shuffled bytes — the classic distributed-kmeans
  * shape. The driver holds k·dim longs between iterations; the corpus
  * is scanned `iters` times and never cached, shuffled whole, or
  * collected.
  *
  * (Reference analog: whylogs uses sklearn KMeans for PCA reference
  * selection — `viz/reference_selection.py`; this is the trainable,
  * hash-exact counterpart, and [[Embeddings]] can consume its
  * centroids.)
  */
object KMeansFixed {

  /** Bound on the centroid plan literal (k·dim cells). */
  val maxPlanCells: Int = 1 << 16

  final case class Model(
      centroids: Array[Array[Long]], // k × dim, post-update
      members: Array[Long], // final-assignment cluster sizes
      inertia: Array[Long]) // final-assignment integer SSE per cluster

  /** Train and return the model as a DataFrame:
    * `(cluster, dim, cval, n_members, inertia)` — one row per
    * (cluster, 1-based dimension); `n_members`/`inertia` are the
    * cluster's final-assignment stats repeated across its dims.
    * Rows ordered (cluster, dim). */
  def train(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, scale: Long = 1000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = trainModel(df, vecCol, idCol, k, iters, scale)
    val rows = for {
      c <- m.centroids.indices
      d <- m.centroids(c).indices
    } yield (c.toLong, (d + 1).toLong, m.centroids(c)(d), m.members(c), m.inertia(c))
    rows.toDF("cluster", "dim", "cval", "n_members", "inertia")
      .orderBy("cluster", "dim")
  }

  /** Driver-held model variant for composition (assignment scoring,
    * IVF seeding). */
  def trainModel(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, scale: Long = 1000L): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val base = quantized(df, vecCol, idCol, scale)
    // init: k smallest ids, in id order (TakeOrdered — never a global sort)
    val init = base.orderBy("__id").limit(k).collect()
    require(init.length == k, s"k=$k but only ${init.length} vectors")
    // the id column must be unique over the first k: a duplicate id
    // would seed two centroids from nondeterministically-ordered rows
    // (and the SQL replay's DISTINCT-then-join would double-count dims)
    require(init.map(_.getLong(0)).distinct.length == k,
      s"duplicate ids among the $k smallest — init needs a unique id column")
    var cents: Array[Array[Long]] = init.map(_.getSeq[Long](1).toArray)
    val dim = cents(0).length
    require(cents.forall(_.length == dim), "ragged vector dimensions")
    require(k.toLong * dim <= maxPlanCells,
      s"k*dim = ${k.toLong * dim} exceeds the $maxPlanCells-cell centroid plan-literal bound")
    var members: Array[Long] = null
    var inertia: Array[Long] = null
    var it = 0
    while (it < iters) {
      val stats = iterStats(base, cents).collect()
      val sums = Array.fill(k, dim)(0L)
      val ns = Array.fill(k)(0L)
      val sse = Array.fill(k)(0L)
      stats.foreach { r =>
        val c = r.getInt(0)
        ns(c) = r.getLong(1)
        sse(c) = r.getLong(2)
        var d = 0
        while (d < dim) { sums(c)(d) = r.getLong(3 + d); d += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (ns(c) == 0L) cents(c) // empty cluster: centroid survives
        else Array.tabulate(dim)(d => math.floor(sums(c)(d).toDouble / ns(c)).toLong)
      }
      members = ns
      inertia = sse
      it += 1
    }
    Model(cents, members, inertia)
  }

  /** INFERENCE: assign every vector to its nearest trained centroid —
    * `keep ++ (cluster, dist2)` with the same integer distance and tie
    * rule as training. Map-only and stateless (the centroid table is a
    * plan literal), so it runs unchanged on a Structured Streaming
    * frame at ingestion time — the cluster-routing step of an IVF
    * index build or a SemDeDup bucketing pass. */
  def assign(df: DataFrame, vecCol: String, idCol: String, model: Model,
      scale: Long = 1000L): DataFrame = {
    val dim = model.centroids(0).length
    if (model.centroids.length.toLong * dim > maxPlanCells)
      return assignJoin(df, vecCol, idCol, model, scale)
    // dirty/ragged input filters EXACTLY as training's quantized():
    // a NULL or wrong-dimension vector yields NULL distances, and a
    // struct with NULL d would win array_min — silently assigning the
    // row to cluster 0 instead of dropping it (inference must not
    // diverge from training on streaming input)
    // alias-then-read: the distance struct evaluates once per row (a
    // twice-referenced alias blocks CollapseProject), as [[iterStats]]
    df.select(F.col(idCol).cast("long").as("id"),
        quantize(F.col(vecCol), scale).as("__q"))
      .filter(F.col("__q").isNotNull && F.size(F.col("__q")) === dim)
      .select(F.col("id"), assignBest(F.col("__q"), model.centroids).as("__b"))
      .select(F.col("id"), F.col("__b.c").cast("long").as("cluster"),
        F.col("__b.d").as("dist2"))
  }

  /** The beyond-the-plan-literal assignment route: past the
    * [[maxPlanCells]] bound (a 4096-cluster × 64-dim IVF codebook is
    * 262k cells — 4× over it) the centroid table ships ONCE per
    * executor as a broadcast join side instead of riding the plan, and
    * the argmin becomes a map-side-combined `min(struct(d, c))` per id
    * — one exchange of (id, struct) partial minima, never the vectors.
    * Same integer distance, same (distance, index) tie rule, same
    * dirty-input filter — [[assign]] routes here automatically, the
    * same loud-ceiling discipline as
    * [[graft.analysis.NaiveBayes]] trainScore. Requires ids unique
    * (one output row per id either way). */
  def assignJoin(df: DataFrame, vecCol: String, idCol: String, model: Model,
      scale: Long = 1000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = model.centroids(0).length
    val cents = model.centroids.zipWithIndex
      .map { case (cv, j) => (j, cv.toSeq) }.toSeq.toDF("__c", "__cv")
    val d2 = F.aggregate(
      F.zip_with(F.col("__q"), F.col("__cv"), (a, b) => (a - b) * (a - b)),
      F.lit(0L), (acc, x) => acc + x)
    df.select(F.col(idCol).cast("long").as("id"),
        quantize(F.col(vecCol), scale).as("__q"))
      .filter(F.col("__q").isNotNull && F.size(F.col("__q")) === dim)
      .crossJoin(F.broadcast(cents))
      .select(F.col("id"), F.struct(d2.as("d"), F.col("__c").as("c")).as("__e"))
      .groupBy("id").agg(F.min("__e").as("__b"))
      .select(F.col("id"), F.col("__b.c").cast("long").as("cluster"),
        F.col("__b.d").as("dist2"))
  }

  /** One Lloyd iteration's update frame over a `(__id, __q)` quantized
    * base: assignment is a map-only literal scan (centroids ride the
    * plan, NOT a join side), and the grouped update is ONE
    * map-side-combined exchange whose k rows × dim sum columns are the
    * only shuffled bytes. One row per non-empty cluster:
    * `(__c, __n, __sd, __s0..__s{dim-1})`.
    *
    * Two deliberate shapes, both learned the hard way (the winnowing
    * O(len²) incident): the assignment struct is ALIASED before its
    * fields are read (a twice-referenced alias blocks CollapseProject,
    * so the k·dim interpreted HOF distance runs ONCE per row, not once
    * per field reference), and the per-dim sums are 64 aggregate
    * columns instead of a posexplode (the exploded form re-evaluated
    * the assignment expression once per DIMENSION row — dim× the
    * work — and inflates the pre-shuffle row count dim×). */
  private[graft] def iterStats(base: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val dim = cents(0).length
    val assigned = base
      .select(assignBest(F.col("__q"), cents).as("__b"), F.col("__q"))
      .select(F.col("__b.c").as("__c"), F.col("__b.d").as("__d2"), F.col("__q"))
    val dimSums = (0 until dim).map(d =>
      F.sum(F.element_at(F.col("__q"), d + 1)).as(s"__s$d"))
    val aggs = Seq(F.count(F.lit(1)).as("__n"), F.sum("__d2").as("__sd")) ++ dimSums
    assigned.groupBy("__c").agg(aggs.head, aggs.tail: _*)
  }

  /** Quantized `(__id, __q)` base frame. */
  private[graft] def quantized(df: DataFrame, vecCol: String, idCol: String,
      scale: Long): DataFrame =
    df.select(F.col(idCol).cast("long").as("__id"),
        quantize(F.col(vecCol), scale).as("__q"))
      .filter(F.col("__q").isNotNull)

  /** `floor(double(v) * scale)` per element. */
  def quantize(vec: Column, scale: Long): Column =
    F.transform(vec, v => F.floor(v.cast("double") * F.lit(scale.toDouble)))

  /** Nearest centroid of a quantized vector as `struct(d, c)` — integer
    * squared L2, ties to the lowest index (struct min ordering). */
  private def assignBest(q: Column, cents: Array[Array[Long]]): Column = {
    val entries = cents.zipWithIndex.map { case (cv, j) =>
      val d2 = F.aggregate(
        F.zip_with(q, F.typedlit(cv.toSeq), (a, b) => (a - b) * (a - b)),
        F.lit(0L), (acc, x) => acc + x)
      F.named_struct(F.lit("d"), d2, F.lit("c"), F.lit(j))
    }
    F.array_min(F.array(entries.toSeq: _*))
  }
}
