package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  // exactly-linear data: y = 1 + 2*x1 + 3*x2, small integers so every
  // OLS sufficient-statistic product is exact in binary64 and the fit
  // recovers the coefficients exactly -> all residuals are exactly 0
  private def linear(n: Int) = (0 until n).map { i =>
    val x1 = i.toLong; val x2 = (i * i % 7).toLong
    (i.toLong, 1L + 2 * x1 + 3 * x2, x1, x2)
  }.toDF("id", "y", "x1", "x2")

  test("intervals: exact-linear data gives q = 0, degenerate covered intervals") {
    val out = Conformal.intervals(linear(30), "id", "y", "x1", "x2")
      .orderBy("id").collect()
    assert(out.length == 10) // ids 2, 5, ..., 29
    assert(out.forall(_.getBoolean(5)))
    assert(out.forall(r => r.getDouble(3) == r.getDouble(4))) // lo == hi
    assert(out.forall(r => r.getDouble(1) == r.getDouble(2))) // y == pred
  }

  test("coverage: k = ceil((n_cal+1)*(1-alpha)) exact; full coverage on linear data") {
    val r = Conformal.coverage(linear(30), "id", "y", "x1", "x2").collect().head
    assert(r.getLong(0) == 10L)          // n_cal
    assert(r.getLong(1) == 10L)          // k = ceil(11*9/10) = 10
    assert(r.getDouble(2) == 0.0)        // q
    assert(r.getLong(3) == 10L && r.getLong(4) == 10L)
    assert(r.getDouble(5) == 1.0)
    // alpha = 1/2: k = ceil(11/2) = 6
    val r2 = Conformal.coverage(linear(30), "id", "y", "x1", "x2",
      alphaNum = 1, alphaDen = 2).collect().head
    assert(r2.getLong(1) == 6L)
  }

  test("coverage holds near target on the documents fixture; partitioning-invariant") {
    val feats = table("documents").select(
      F.col("doc_id"), F.col("n_chars").as("y"),
      graft.pipeline.TextAnalysis.tokenCount(F.col("text")).as("x1"),
      graft.pipeline.TextAnalysis.alphaCount(F.col("text")).as("x2"))
    val a = Conformal.coverage(feats, "doc_id", "y", "x1", "x2").collect().head
    assert(a.getDouble(5) >= 0.8) // finite-sample guarantee is >= 0.9 in expectation
    val b = Conformal.coverage(feats.repartition(11), "doc_id", "y", "x1", "x2")
      .collect().head
    assert(a.toSeq == b.toSeq)
  }

  test("mondrianCoverage: per-group radii; undersized groups report NULL; invariance") {
    val feats = table("documents").select(
      F.col("doc_id"), F.col("lang"), F.col("n_chars").as("y"),
      graft.pipeline.TextAnalysis.tokenCount(F.col("text")).as("x1"),
      graft.pipeline.TextAnalysis.alphaCount(F.col("text")).as("x2"))
    val a = Conformal.mondrianCoverage(feats, "lang", "doc_id", "y", "x1", "x2")
      .orderBy("lang").collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val (nCal, k) = (r.getLong(1), r.getLong(2))
      assert(k == ((nCal + 1) * 9 + 9) / 10)
      if (k > nCal) assert(r.isNullAt(3) && r.isNullAt(6)) // reported, not dropped
      else {
        assert(!r.isNullAt(3))
        assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
      }
    }
    val b = Conformal.mondrianCoverage(feats.repartition(9), "lang", "doc_id",
      "y", "x1", "x2").orderBy("lang").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("mondrianCoverage: exact-linear data gives q = 0 and full coverage per group") {
    val df = linear(60).withColumn("g",
      F.when(F.col("id") % 2 === 0, "even").otherwise("odd"))
    val rows = Conformal.mondrianCoverage(df, "g", "id", "y", "x1", "x2")
      .collect()
    rows.filter(r => !r.isNullAt(3)).foreach { r =>
      assert(r.getDouble(3) == 0.0 && r.getDouble(6) == 1.0)
    }
  }

  test("too-small calibration split fails loudly") {
    intercept[IllegalArgumentException] {
      // train = 8 rows (fit fine); n_cal = 8, k = ceil(9*9/10) = 9 > 8
      Conformal.intervals(linear(24), "id", "y", "x1", "x2")
    }
  }
}
