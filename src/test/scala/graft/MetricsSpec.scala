package graft

import org.apache.spark.sql.{functions => F, Row}
import graft.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def dist(vals: Seq[java.lang.Double], parts: Int): Row =
    vals.toDF("x").repartition(parts)
      .agg(distribution_agg(F.col("x")).as("d"))
      .select("d.*").collect()(0)

  test("distribution: moments match exact computation, any partitioning") {
    val vals = (1 to 1000).map(i => java.lang.Double.valueOf((i % 37) * 0.5 + i * 0.001))
    val exactMean = vals.map(_.doubleValue).sum / vals.size
    val exactVar = vals.map(v => math.pow(v - exactMean, 2)).sum / (vals.size - 1)
    for (parts <- Seq(1, 3, 7)) {
      val r = dist(vals, parts)
      assert(r.getAs[Long]("n") == 1000)
      assert(math.abs(r.getAs[Double]("mean") - exactMean) < 1e-9)
      assert(math.abs(math.pow(r.getAs[Double]("stddev"), 2) - exactVar) < 1e-9)
      assert(r.getAs[Double]("min") == vals.map(_.doubleValue).min)
      assert(r.getAs[Double]("max") == vals.map(_.doubleValue).max)
    }
  }

  test("distribution: ignores null/NaN/Inf; exact quantiles for small n") {
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, 5.0, Double.NaN, Double.PositiveInfinity) :+
        (null: java.lang.Double)
    val r = dist(vals, 2)
    assert(r.getAs[Long]("n") == 5)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 5.0)
    val qs = r.getAs[scala.collection.Seq[Double]]("quantiles")
    // median of 1..5 (KLL exact while n < k)
    assert(qs(4) == 3.0)
  }

  test("distribution: KLL quantiles within rank-error bound at 100k") {
    val n = 100000
    val vals = (1 to n).map(i => java.lang.Double.valueOf(i.toDouble))
    val r = dist(vals, 8)
    val qs = r.getAs[scala.collection.Seq[Double]]("quantiles")
    val ranks = graft.metrics.DistributionAgg.DefaultQuantiles
    ranks.zip(qs).foreach { case (rank, q) =>
      // k=1024 ⇒ normalized rank error ~0.7% (datasketches published bound ~1.33% @ 99%)
      assert(math.abs(q / n - rank) < 0.02, s"rank $rank got $q")
    }
  }

  test("cardinality: exact for small distinct sets; merge-stable") {
    val vals = (1 to 10000).map(i => s"v${i % 50}")
    for (parts <- Seq(1, 5)) {
      val r = vals.toDF("x").repartition(parts)
        .agg(cardinality_agg(F.col("x")).as("c")).select("c.*").collect()(0)
      assert(math.round(r.getAs[Double]("estimate")) == 50L)
      assert(r.getAs[Double]("lower") <= 50 && r.getAs[Double]("upper") >= 50)
    }
  }

  test("frequent items: exact counts for small domains, deterministic order") {
    val vals = (1 to 1000).map(i => s"k${i % 7}")
    val r = vals.toDF("x").repartition(3)
      .agg(frequent_items_agg(F.col("x")).as("f")).select("f.*").collect()(0)
    val items = r.getAs[scala.collection.Seq[Row]]("items")
    assert(items.size == 7)
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    items.foreach { ir =>
      assert(ir.getAs[Long]("estimate") == exact(ir.getAs[String]("value")))
    }
    // sorted by estimate desc then value asc
    val ests = items.map(_.getAs[Long]("estimate"))
    assert(ests == ests.sorted.reverse)
  }

  test("cosine similarity matches hand computation") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(cosine_similarity(F.col("a"), F.col("b")).as("c")).collect()(0).getDouble(0)
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - expect) < 1e-12)
  }

  test("native cosine similarity is bit-identical to the HOF oracle (float + double paths)") {
    val rnd = new scala.util.Random(7)
    val floatRows = (1 to 50).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2f - 1f), Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val fdf = floatRows.toDF("a", "b")
    val fGot = fdf.select(
      cosine_similarity(F.col("a"), F.col("b")).as("n"),
      graft.functions.cosine_similarity_hof(F.col("a"), F.col("b")).as("h")).collect()
    fGot.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"float path diverged: $r")
    }
    val ddf = fdf.select(F.col("a").cast("array<double>").as("a"),
      F.col("b").cast("array<double>").as("b"))
    val dGot = ddf.select(
      cosine_similarity(F.col("a"), F.col("b")).as("n"),
      graft.functions.cosine_similarity_hof(F.col("a"), F.col("b")).as("h")).collect()
    dGot.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"double path diverged: $r")
    }
  }

  test("native cosine similarity edge cases: null array, null element, length mismatch, empty") {
    val df = Seq(
      (1, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(1.0), Some(2.0)))), // ok
      (2, None, Some(Seq(Some(1.0), Some(2.0)))),                            // null array
      (3, Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),      // null element
      (4, Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))),            // length mismatch
      (5, Some(Seq.empty[Option[Double]]), Some(Seq.empty[Option[Double]]))  // empty -> NaN
    ).toDF("id", "a", "b")
    val rows = df.select(F.col("id"), cosine_similarity(F.col("a"), F.col("b")).as("c"))
      .orderBy("id").collect()
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(1))
    assert(rows(2).isNullAt(1))
    assert(rows(3).isNullAt(1))
    assert(rows(4).getDouble(1).isNaN)
  }
}
