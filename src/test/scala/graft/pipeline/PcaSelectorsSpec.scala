package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** PCA reference selectors (reference
  * `experimental/preprocess/embeddings/selectors.py:22-105`). All
  * assertions are sign-invariant: eigenvectors come back with arbitrary
  * sign, so we pin the projection OPERATOR (round trips, residuals,
  * linearity), never raw component values. */
class PcaSelectorsSpec extends SparkSpec {

  // deterministic rank-2 data in R^4: span{u, w} shifted by an offset,
  // so a 2-component PCA must recover the subspace exactly (up to fp)
  private val u = Array(1.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(2))
  private val w = Array(0.0, 0.0, 1.0, -1.0).map(_ / math.sqrt(2))
  private val off = Array(10.0, -3.0, 4.0, 4.0)
  private def pt(a: Double, b: Double): Array[Double] =
    Array.tabulate(4)(i => off(i) + a * u(i) + b * w(i))

  private def fixture = {
    import spark.implicits._
    // label "a" clusters near (2, 1) in (u, w) coords, "b" near (-3, 4);
    // one gross outlier in "a" for the trim test
    val rows = Seq(
      (1L, "a", pt(2.0, 1.0)), (2L, "a", pt(2.5, 0.5)),
      (3L, "a", pt(1.5, 1.5)), (4L, "a", pt(2.0, 0.8)),
      (5L, "a", pt(400.0, 1.0)), // outlier along u
      (6L, "b", pt(-3.0, 4.0)), (7L, "b", pt(-2.5, 4.5)),
      (8L, "b", pt(-3.5, 3.5)), (9L, "b", pt(-3.0, 4.2)),
      (10L, "b", pt(-2.8, 3.8)))
    rows.toDF("vec_id", "label", "embedding")
  }

  private def maxAbsDiff(x: Array[Double], y: Array[Double]): Double =
    x.zip(y).map { case (a, b) => math.abs(a - b) }.max

  test("fitPca recovers a rank-2 subspace: round trip is identity on the data") {
    val df = fixture
    val model = Embeddings.fitPca(df, "embedding", 2)
    assert(model.k == 2 && model.components.forall(_.length == 4))
    // every in-subspace point survives project->inverse unchanged
    val pts = Seq(pt(2.0, 1.0), pt(-3.0, 4.0), pt(400.0, 1.0), off)
    pts.foreach { x =>
      assert(maxAbsDiff(model.roundTrip(x), x) < 1e-6,
        s"round trip moved an in-subspace point by ${maxAbsDiff(model.roundTrip(x), x)}")
    }
    // an out-of-subspace direction projects onto the subspace: applying
    // the round trip twice equals applying it once (idempotence)
    val outside = Array(1.0, -1.0, 0.0, 0.0)
    val once = model.roundTrip(outside)
    assert(maxAbsDiff(model.roundTrip(once), once) < 1e-6)
    // the components are orthonormal regardless of sign
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(model.components(0), model.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(model.components(1), model.components(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(model.components(0), model.components(1))) < 1e-9)
  }

  test("pcaProjection column expressions equal the driver-side project()") {
    import spark.implicits._
    val df = fixture
    val model = Embeddings.fitPca(df, "embedding", 2)
    val got = df
      .select(F.col("vec_id"),
        F.array(Embeddings.pcaProjection(F.col("embedding"), model): _*).as("z"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toArray).toMap
    val raw = df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]](1).toArray)
    raw.foreach { case (id, v) =>
      assert(maxAbsDiff(got(id), model.project(v)) < 1e-9,
        s"column projection disagrees with driver projection for vec $id")
    }
  }

  test("untrimmed pcaCentroidReferences = PCA round trip of the raw label centroids") {
    val df = fixture
    val model = Embeddings.fitPca(df, "embedding", 2)
    val refs = Embeddings.pcaCentroidReferences(df, "embedding", "label").toMap
    assert(refs.keySet == Set("a", "b"))
    val rawCentroids = Embeddings.labeledReferences(df, "embedding", "label").toMap
    // linearity: centroid-in-PCA-space inverse-transformed == round trip
    // of the raw centroid (the reference computes the left side)
    for ((l, c) <- rawCentroids)
      assert(maxAbsDiff(refs(l), model.roundTrip(c)) < 1e-6,
        s"label $l: PCA centroid != round-tripped raw centroid")
    // and every reference lies in the affine principal subspace
    refs.values.foreach(r => assert(maxAbsDiff(model.roundTrip(r), r) < 1e-6))
  }

  test("percentile trim discards the outlier; trimmed centroid moves toward the bulk") {
    val df = fixture
    val untrimmed = Embeddings.pcaCentroidReferences(df, "embedding", "label").toMap
    val trimmed = Embeddings.pcaCentroidReferences(df, "embedding", "label",
      nComponents = 2, lowerPercentile = 10.0, upperPercentile = 90.0).toMap
    assert(trimmed.keySet == Set("a", "b"))
    // label a's untrimmed centroid is dragged ~80 units along u by the
    // (400, 1) outlier; the 10/90 trim must pull it back near (2, 1)
    val bulk = pt(2.0, 1.0)
    def dist(x: Array[Double], y: Array[Double]) =
      math.sqrt(x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum)
    assert(dist(trimmed("a"), bulk) < dist(untrimmed("a"), bulk) / 10,
      s"trim did not suppress the outlier: trimmed=${dist(trimmed("a"), bulk)} " +
        s"untrimmed=${dist(untrimmed("a"), bulk)}")
  }

  test("pcaKmeansReferences: k references, each inside the principal subspace") {
    val df = fixture
    val model = Embeddings.fitPca(df, "embedding", 2)
    val refs = Embeddings.pcaKmeansReferences(df, "vec_id", "embedding",
      nClusters = 3, nComponents = 2)
    assert(refs.map(_._1) == Seq("cluster_0", "cluster_1", "cluster_2"))
    refs.foreach { case (l, r) =>
      assert(r.length == 4)
      assert(maxAbsDiff(model.roundTrip(r), r) < 1e-6,
        s"$l is outside the principal subspace")
    }
  }
}
