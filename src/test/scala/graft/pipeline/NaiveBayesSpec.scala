package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Multinomial NB semantics: quantized log-prob arithmetic checked
  * against the formula computed independently in the test, argmax
  * tie-breaking, empty-doc priors, and partitioning invariance. */
class NaiveBayesSpec extends SparkSpec {

  private def lnq(x: Double): Long = math.floor(math.log(x) * 1e6).toLong

  private val train = Seq(
    ("apple banana", "fruit"),
    ("carrot potato", "veg"),
    ("banana banana apple", "fruit"))

  test("scores equal the add-one multinomial formula under 1e-6 quantization") {
    import spark.implicits._
    val tr = train.toDF("text", "label")
    val sc = Seq((10L, "banana"), (11L, "potato carrot carrot")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(tr, sc, "text", "label", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // fruit: tokens {apple:2, banana:3} total 5, docs 2; veg: total 2, docs 1
    // V = 4, nDocs = 3
    val fruitBanana = (lnq(3 + 1) - lnq(5 + 4)) + lnq(2) - lnq(3)
    assert(got(10L) == ("fruit", fruitBanana.toDouble / 1e6))
    val vegDoc = // potato(1) + carrot(1)*2 under veg
      (lnq(1 + 1) - lnq(2 + 4)) * 3 + lnq(1) - lnq(3)
    assert(got(11L) == ("veg", vegDoc.toDouble / 1e6))
  }

  test("empty/blank documents score on priors alone") {
    import spark.implicits._
    val tr = train.toDF("text", "label")
    val sc = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(tr, sc, "text", "label", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val prior = (lnq(2) - lnq(3)).toDouble / 1e6 // fruit has 2 of 3 docs
    assert(got(1L) == ("fruit", prior) && got(2L) == ("fruit", prior))
  }

  test("exact score ties break to the largest class label") {
    import spark.implicits._
    val tr = Seq(("x", "a"), ("x", "b")).toDF("text", "label")
    val sc = Seq((1L, "x")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(tr, sc, "text", "label", "doc_id").collect()
    assert(got.head.getString(1) == "b")
  }

  test("numeric labels are accepted (cast to string classes)") {
    import spark.implicits._
    val tr = Seq(("apple apple", 0), ("zebra zebra", 1)).toDF("text", "label")
    val sc = Seq((1L, "zebra")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(tr, sc, "text", "label", "doc_id").collect()
    assert(got.head.getString(1) == "1")
  }

  test("map-only scoreColumn is bit-identical to the distributed trainScore") {
    import spark.implicits._
    val docs = table("documents")
    val dist = NaiveBayes.trainScore(docs, docs, "text", "lang", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val model = NaiveBayes.trainModel(docs, "text", "lang")
    val local = docs.select(F.col("doc_id"),
        NaiveBayes.scoreColumn(F.col("text"), model).as("r"))
      .select(F.col("doc_id"), F.col("r.pred"), F.col("r.score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(local == dist && local.nonEmpty)
    // the map-only plan carries no exchange and no join
    val plan = docs.select(NaiveBayes.scoreColumn(F.col("text"), model))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
  }

  test("trainModel: counts, totals, vocab and priors match hand counting") {
    import spark.implicits._
    val m = NaiveBayes.trainModel(train.toDF("text", "label"), "text", "label")
    assert(m.classes == Seq("fruit", "veg"))
    assert(m.classTotals == Seq(5L, 2L) && m.classDocs == Seq(2L, 1L))
    assert(m.vocab == 4L && m.nDocs == 3L)
    assert(m.counts("banana") == Seq(3L, 0L))
    assert(m.counts("carrot") == Seq(0L, 1L))
  }

  test("result is partitioning-invariant (integer-quantized sums)") {
    import spark.implicits._
    val docs = table("documents")
    val a = NaiveBayes.trainScore(docs.coalesce(1), docs.coalesce(1),
      "text", "lang", "doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val b = NaiveBayes.trainScore(docs.repartition(7), docs.repartition(5),
      "text", "lang", "doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }
}
