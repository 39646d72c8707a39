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
