package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): keep-low-centroid-
  * similarity semantic dedup. The single-cluster run is pinned against
  * an independent in-test brute-force reference; the clustered and
  * anchor-capped runs are pinned on soundness invariants that hold for
  * ANY clustering (every drop is witnessed by a more-keepable exact
  * near-dup in the same cluster). */
class SemDeDupSpec extends SparkSpec {

  private def vecs: Map[Long, Array[Double]] =
    table("embeddings")
      .select(F.col("vec_id"), F.col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap

  /** Same accumulation shape as graft.functions.cosine_similarity on
    * double arrays: one fold, dot/(sqrt·sqrt). */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Independent single-cluster reference: centroid = mean in id order
    * (trainCentroids' sample order), drop rule = exists a strictly
    * more-keepable (centroid_sim, id)-lexicographic near-dup at >= tau. */
  private def bruteSingleCluster(v: Map[Long, Array[Double]], tau: Double): Map[Long, Boolean] = {
    val ids = v.keys.toArray.sorted
    val dim = v(ids.head).length
    val cent = new Array[Double](dim)
    ids.foreach { id => val x = v(id); var i = 0; while (i < dim) { cent(i) += x(i); i += 1 } }
    var i = 0
    while (i < dim) { cent(i) /= ids.length; i += 1 }
    val cs = ids.map(id => id -> cos(v(id), cent)).toMap
    ids.map { m =>
      val dropped = ids.exists { x =>
        x != m &&
          (cs(x) < cs(m) || (cs(x) == cs(m) && x < m)) &&
          cos(v(m), v(x)) >= tau
      }
      m -> !dropped
    }.toMap
  }

  test("single-cluster semDeDup matches the brute-force reference") {
    val v = vecs
    val expected = bruteSingleCluster(v, tau = 0.4)
    val got = Similarity.semDeDup(table("embeddings"), "vec_id", "embedding",
        numClusters = 1, tau = 0.4)
      .select("id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.size === v.size)
    assert(got === expected)
    // the fixture must actually exercise both outcomes
    assert(got.values.exists(identity) && got.values.exists(!_))
  }

  test("clustered drops are sound: each has a more-keepable same-cluster near-dup") {
    val v = vecs
    val rows = Similarity.semDeDup(table("embeddings"), "vec_id", "embedding",
        numClusters = 4, tau = 0.4)
      .select("id", "cluster_id", "centroid_sim", "keep").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length === v.size)
    val byCluster = rows.groupBy(_._2)
    rows.filterNot(_._4).foreach { case (id, cl, cs, _) =>
      val witness = byCluster(cl).exists { case (xid, _, xcs, _) =>
        xid != id && (xcs < cs || (xcs == cs && xid < id)) && cos(v(id), v(xid)) >= 0.4
      }
      assert(witness, s"dropped $id has no witness in cluster $cl")
    }
  }

  test("anchor cap only shrinks the drop set and keeps it sound") {
    val v = vecs
    def drops(maxAnchors: Int): Set[Long] =
      Similarity.semDeDup(table("embeddings"), "vec_id", "embedding",
          numClusters = 1, tau = 0.4, maxAnchors = maxAnchors)
        .filter(!F.col("keep")).select("id").collect().map(_.getLong(0)).toSet
    val full = drops(Int.MaxValue)
    val capped = drops(3)
    assert(capped.subsetOf(full))
    // the 3 most-keepable anchors still witness every capped drop
    val csOrder = bruteCentroidSims(v).toSeq.sortBy { case (id, cs) => (cs, id) }
    val anchors = csOrder.take(3).map(_._1).toSet
    capped.foreach { id =>
      assert(anchors.exists(a => a != id && cos(v(id), v(a)) >= 0.4))
    }
  }

  private def bruteCentroidSims(v: Map[Long, Array[Double]]): Map[Long, Double] = {
    val ids = v.keys.toArray.sorted
    val dim = v(ids.head).length
    val cent = new Array[Double](dim)
    ids.foreach { id => val x = v(id); var i = 0; while (i < dim) { cent(i) += x(i); i += 1 } }
    var i = 0
    while (i < dim) { cent(i) /= ids.length; i += 1 }
    ids.map(id => id -> cos(v(id), cent)).toMap
  }

  test("randomized corpora match the brute-force reference (3 seeded draws)") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // clustered blobs + noise so near-dup pairs exist at tau
      val centers = Array.fill(4)(Array.fill(8)(rnd.nextGaussian()))
      val rows = (0L until 120L).map { i =>
        val c = centers(rnd.nextInt(4))
        (i, c.map(x => x + rnd.nextGaussian() * 0.15))
      }
      val df = rows.toDF("vec_id", "embedding")
      val v = rows.toMap.map { case (k, arr) => k -> arr }
      val got = Similarity.semDeDup(df, "vec_id", "embedding",
          numClusters = 1, tau = 0.9, sampleSize = 4096)
        .select("id", "keep").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got === bruteSingleCluster(v, tau = 0.9), s"seed $seed")
    }
  }

  test("semDeDupAuto: k rule clamps correctly and matches semDeDup at the derived k") {
    // the k rule itself, across the clamp boundaries
    assert(Similarity.autoClusters(0L, 8192, 65536) === 1)
    assert(Similarity.autoClusters(1L, 8192, 65536) === 1)
    assert(Similarity.autoClusters(8192L, 8192, 65536) === 1)
    assert(Similarity.autoClusters(8193L, 8192, 65536) === 2)
    assert(Similarity.autoClusters(1000000L, 8192, 65536) === 123)
    assert(Similarity.autoClusters(Long.MaxValue, 1, 65536) === 65536)
    // end-to-end: auto at targetClusterSize n (k=1) ≡ explicit k=1,
    // and a small target derives the expected larger k
    val emb = table("embeddings")
    val n = emb.count()
    val auto = Similarity.semDeDupAuto(emb, "vec_id", "embedding", tau = 0.4,
        targetClusterSize = n.toInt)
      .select("id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val explicit = Similarity.semDeDup(emb, "vec_id", "embedding",
        numClusters = 1, tau = 0.4)
      .select("id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(auto === explicit)
    val k = Similarity.autoClusters(n, 16, 65536)
    assert(k === ((n + 15) / 16).toInt && k > 1)
    val clustered = Similarity.semDeDupAuto(emb, "vec_id", "embedding",
      tau = 0.4, targetClusterSize = 16)
    // cluster ids come from the k-codebook, and every row gets a verdict
    assert(clustered.count() === n)
    assert(clustered.agg(F.max("cluster_id")).collect()(0).getInt(0) < k)
  }

  test("singletons and duplicate groups: keep exactly the least-central member") {
    import spark.implicits._
    // two tight pairs + one far singleton, dim 2
    val df = Seq(
      (1L, Array(1.0, 0.0)),      // pair A, closer to centroid than 2
      (2L, Array(0.999, 0.045)),  // pair A
      (3L, Array(-1.0, 0.6)),     // pair B
      (4L, Array(-1.0, 0.62)),    // pair B
      (5L, Array(0.0, -1.0))      // singleton
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(df, "vec_id", "embedding", numClusters = 1, tau = 0.95)
      .select("id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val v = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(got === bruteSingleCluster(v, tau = 0.95))
    // exactly one member of each tight pair survives; the singleton survives
    assert(got(5L))
    assert(got.count { case (id, k) => Set(1L, 2L).contains(id) && k } === 1)
    assert(got.count { case (id, k) => Set(3L, 4L).contains(id) && k } === 1)
  }
}
