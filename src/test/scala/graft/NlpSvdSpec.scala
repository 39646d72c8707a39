package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.NlpSvd

/** Truncated-SVD NLP metric. */
class NlpSvdSpec extends SparkSpec {

  private val dim = 32
  private val k = 6

  private def fitted = {
    val docs = table("documents")
    val vecs = docs.select(F.col("doc_id"),
      NlpSvd.termVector(F.col("text"), dim).as("tv"))
    (vecs, NlpSvd.fit(vecs, "tv", k, dim))
  }

  test("fitted basis is orthonormal and residuals are in [0, 1]") {
    val (vecs, svd) = fitted
    // V'V = I
    for (a <- 0 until svd.k; b <- 0 until svd.k) {
      val dot = svd.v(a).zip(svd.v(b)).map { case (x, y) => x * y }.sum
      val expected = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-8, s"V'V[$a][$b] = $dot")
    }
    val sample = vecs.limit(20).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("tv").toArray)
    sample.foreach { v =>
      val r = svd.residual(v)
      assert(r >= 0.0 && r <= 1.0 + 1e-9, s"residual $r")
    }
  }

  test("vectors inside the learned subspace have ~zero residual") {
    val (_, svd) = fitted
    assert(svd.residual(svd.v(0)) < 1e-8)
    // a mix of two basis vectors is also in the span
    val mix = svd.v(0).zip(svd.v(1)).map { case (a, b) => 3.0 * a - 2.0 * b }
    assert(svd.residual(mix) < 1e-8)
  }

  test("native term vector matches the HOF semantics oracle") {
    val docs = table("documents").limit(200)
    val rows = docs.select(
      NlpSvd.termVector(F.col("text"), dim).as("native"),
      NlpSvd.termVectorHof(F.col("text"), dim).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    }
  }

  test("NULL text yields a NULL vector and a NULL residual") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String]),
      (3L, "alpha beta delta"), (4L, "")).toDF("doc_id", "text")
    val vecs = df.select(F.col("doc_id"), NlpSvd.termVector(F.col("text"), dim).as("tv"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(vecs(2L) == null, "NULL text must give a NULL vector, not per-slot NULLs")
    assert(vecs(4L).asInstanceOf[scala.collection.Seq[Double]].forall(_ == 0.0))
    val resid = NlpSvd.residualsDF(df, "doc_id", "text", dim, 2)
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(resid(2L) == null, "NULL text must score a NULL residual")
    assert(resid(1L) != null && resid(3L) != null && resid(4L) != null)
  }

  test("residualsFromVectors: closed-form residuals on an exactly diagonal Gramian") {
    import spark.implicits._
    // integer axis-aligned vectors + a sign-balanced (3,0,±4,0) pair:
    // the Gramian is an exactly diagonal integer matrix, so the top-2
    // subspace is exactly span(e1, e2) and residuals are analytic
    val rows = Seq(
      (0L, Seq(5.0, 0.0, 0.0, 0.0)), (1L, Seq(9.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 6.0, 0.0, 0.0)), (3L, Seq(0.0, 8.0, 0.0, 0.0)),
      (4L, Seq(0.0, 0.0, 7.0, 0.0)),           // orthogonal -> 1
      (5L, Seq(3.0, 0.0, 4.0, 0.0)),           // mixed -> 4/5
      (6L, Seq(3.0, 0.0, -4.0, 0.0)))          // sign-balance partner
      .toDF("id", "v")
    val got = NlpSvd.residualsFromVectors(rows, "id", "v", dim = 4, k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(0L)) < 1e-9 && math.abs(got(2L)) < 1e-9)
    assert(math.abs(got(4L) - 1.0) < 1e-9)
    assert(math.abs(got(5L) - 0.8) < 1e-9 && math.abs(got(6L) - 0.8) < 1e-9)
  }

  test("residualsDF scores every document, stable across runs") {
    val docs = table("documents")
    val r1 = NlpSvd.residualsDF(docs, "doc_id", "text", dim, k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r1.size == docs.count())
    // the distributed Gramian's summation order varies run to run, so
    // scores are stable only to float tolerance (projection residuals
    // are rotation/sign invariant)
    val r2 = NlpSvd.residualsDF(docs, "doc_id", "text", dim, k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    r1.foreach { case (id, v) => assert(math.abs(v - r2(id)) < 1e-6, s"doc $id") }
  }
}
