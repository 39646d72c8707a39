package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class KMeansFixedSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "embedding")
      .select(F.col("vec_id"),
        F.col("embedding").cast("array<float>").as("embedding"))

  test("hand-computed 1D run: init, assignment, floor-div update, inertia") {
    // scale 10: q = floor(v*10) -> 0, 10, 100, 103 (10.4f stores as
    // 10.399999..., so float->double*10 floors to 103 — exactly what
    // both engines compute)
    val d = df(Seq((1L, Seq(0.0)), (2L, Seq(1.0)), (3L, Seq(10.0)), (4L, Seq(10.4))))
    val m = KMeansFixed.trainModel(d, "embedding", "vec_id", k = 2, iters = 2, scale = 10L)
    // init c0=[0], c1=[10]; iter1: 0->c0; 10->c1 (d=0); 100,103->c1
    //   c0=[0], c1=floor((10+100+103)/3)=[71]
    // iter2 vs (0, 71): 0,10 -> c0; 100,103 -> c1
    //   c0=floor(10/2)=[5], c1=floor(203/2)=[101]
    //   iter2 assignment: c0={0,10} n=2 sse=0+100; c1 sse=29^2+32^2
    assert(m.centroids.map(_.toSeq).toSeq == Seq(Seq(5L), Seq(101L)))
    assert(m.members.toSeq == Seq(2L, 2L))
    assert(m.inertia.toSeq == Seq(100L, 29L * 29L + 32L * 32L))
  }

  test("negative values: quantization floors toward -inf, update floor-divides") {
    // q = floor(-0.15*10) = -2 (not -1)
    val d = df(Seq((1L, Seq(-0.15)), (2L, Seq(-0.35))))
    val m = KMeansFixed.trainModel(d, "embedding", "vec_id", k = 1, iters = 1, scale = 10L)
    // qs: -2, -4; centroid floor(-6/2) = -3
    assert(m.centroids(0).toSeq == Seq(-3L))
  }

  test("distance ties assign to the lowest centroid index") {
    // two identical init centroids: everything lands on index 0
    val d = df(Seq((1L, Seq(1.0)), (2L, Seq(1.0)), (3L, Seq(5.0))))
    val m = KMeansFixed.trainModel(d, "embedding", "vec_id", k = 2, iters = 1, scale = 10L)
    assert(m.members.toSeq == Seq(3L, 0L))
    // empty cluster 1 keeps its init centroid
    assert(m.centroids(1).toSeq == Seq(10L))
  }

  test("result is partitioning-invariant") {
    val emb = table("embeddings")
    val a = KMeansFixed.train(emb, "embedding", "vec_id", k = 3, iters = 2)
      .collect().toSeq
    val b = KMeansFixed.train(emb.repartition(13), "embedding", "vec_id", k = 3, iters = 2)
      .collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("k*dim plan-literal bound enforced") {
    val e = intercept[IllegalArgumentException] {
      KMeansFixed.trainModel(table("embeddings"), "embedding", "vec_id",
        k = 2000, iters = 1)
    }
    assert(e.getMessage.contains("bound") || e.getMessage.contains("only"))
  }

  test("assignJoin agrees with the plan-literal assign, ties included") {
    val emb = table("embeddings")
    val m = KMeansFixed.trainModel(emb, "embedding", "vec_id", k = 3, iters = 2)
    val a = KMeansFixed.assign(emb, "embedding", "vec_id", m)
      .orderBy("id").collect().toSeq
    val b = KMeansFixed.assignJoin(emb, "embedding", "vec_id", m)
      .orderBy("id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("assign drops NULL and wrong-dimension vectors (dirty streaming input)") {
    val clean = df(Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 1.0))))
    val m = KMeansFixed.trainModel(clean, "embedding", "vec_id", k = 2, iters = 1,
      scale = 10L)
    val dirty = Seq(
      (1L, Some(Seq(0.0, 0.0))),
      (3L, None), // NULL vector
      (4L, Some(Seq(0.5))) // ragged: trained dim is 2
    ).toDF("vec_id", "embedding")
      .select(F.col("vec_id"), F.col("embedding").cast("array<float>").as("embedding"))
    for (route <- Seq(
        KMeansFixed.assign(dirty, "embedding", "vec_id", m, scale = 10L),
        KMeansFixed.assignJoin(dirty, "embedding", "vec_id", m, scale = 10L))) {
      val rows = route.orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L)) // 3 and 4 dropped
      assert(!rows.exists(_.isNullAt(2))) // never a NULL dist2 assigned to cluster 0
    }
  }

  test("init requires distinct ids over the first k") {
    val dup = df(Seq((1L, Seq(0.0)), (1L, Seq(9.0)), (2L, Seq(5.0))))
    val e = intercept[IllegalArgumentException] {
      KMeansFixed.trainModel(dup, "embedding", "vec_id", k = 2, iters = 1, scale = 10L)
    }
    assert(e.getMessage.contains("duplicate ids"))
  }
}
