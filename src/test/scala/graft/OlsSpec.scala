package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.Ols

/** Closed-form OLS: exact recovery of an exact-integer plane,
  * R² behavior under noise, partitioning invariance, and the ANSI
  * singular-design failure mode. */
class OlsSpec extends SparkSpec {

  test("recovers an exact integer plane bit-exactly (b0=3, b1=2, b2=5, r2=1)") {
    import spark.implicits._
    val pts = for (x1 <- 0 to 5; x2 <- 0 to 5)
      yield (3L + 2L * x1 + 5L * x2, x1.toLong, x2.toLong)
    val df = pts.toDF("y", "x1", "x2")
    val r = Ols.fit2(df, "y", "x1", "x2").collect().head
    assert(r.getLong(0) == 36L)
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("noise lowers r2 below 1 and keeps coefficients near the plane") {
    import spark.implicits._
    val pts = (for (x1 <- 0 to 5; x2 <- 0 to 5)
      yield (3L + 2L * x1 + 5L * x2, x1.toLong, x2.toLong)) :+ (4L, 0L, 0L)
    val r = Ols.fit2(pts.toDF("y", "x1", "x2"), "y", "x1", "x2").collect().head
    assert(r.getDouble(4) < 1.0 && r.getDouble(4) > 0.99)
    assert(math.abs(r.getDouble(2) - 2.0) < 0.1 && math.abs(r.getDouble(3) - 5.0) < 0.1)
  }

  test("result is partitioning-invariant (BIGINT sufficient statistics)") {
    val docs = table("documents").select(
      F.col("n_chars").as("y"),
      graft.pipeline.TextAnalysis.tokenCount(F.col("text")).as("x1"),
      graft.pipeline.TextAnalysis.alphaCount(F.col("text")).as("x2"))
    val a = Ols.fit2(docs.coalesce(1), "y", "x1", "x2").collect().head
    val b = Ols.fit2(docs.repartition(7), "y", "x1", "x2").collect().head
    assert(a == b)
    assert(a.getDouble(4) > 0.5) // chars ~ tokens+alpha is a real fit
  }

  test("a singular design fails loudly under ANSI (duplicate feature)") {
    import spark.implicits._
    val df = Seq((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 4L)).toDF("y", "x1", "x2")
    val e = intercept[Exception] { Ols.fit2(df, "y", "x1", "x2").collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString
    assert(msgs.contains("DIVIDE_BY_ZERO"))
  }
}
