package graft.pipeline

import graft.SparkSpec

/** BM25 ranked retrieval: hand-computed scores on a tiny corpus, the
  * classic rarity/length-normalization orderings, quantization
  * harmlessness, and partitioning invariance. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark runs fast joins"),            // dl 4, has joins? no: "joins" != "join"
    (2L, "join join join filter scan"),       // tf(join)=3, dl 5
    (3L, "the quick brown fox"),              // no hits, dl 4
    (4L, "join filter"),                      // tf(join)=1, dl 2
    (5L, "scan scan filter join scan scan")   // tf(join)=1, dl 6
  ).toDF("doc_id", "text")

  /** Reference scorer mirroring the operator's op order exactly. */
  private def bm25(n: Long, sumDl: Long, terms: Seq[(String, Long, Long)],
      dl: Long, k1: Double = 1.5, b: Double = 0.75): Double = {
    val avgdl = sumDl.toDouble / n.toDouble
    terms.sortBy(_._1).foldLeft(0.0) { case (acc, (_, tf, df)) =>
      val idf = math.log(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
      acc + idf * (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
    }
  }

  test("scores match a hand-rolled scorer bit-for-bit (same JVM libm)") {
    val got = TextAnalysis.bm25TopDocs(corpus, "doc_id", "text", Seq("join", "scan"))
      .select("doc_id", "score", "n_terms_hit", "rank")
      .as[(Long, Double, Long, Long)].collect().toSeq
    // corpus stats: n=5, sum_dl=4+5+4+2+6=21; df(join)=3 (docs 2,4,5), df(scan)=2 (2,5)
    val exp = Seq(
      2L -> bm25(5, 21, Seq(("join", 3L, 3L), ("scan", 1L, 2L)), 5),
      4L -> bm25(5, 21, Seq(("join", 1L, 3L)), 2),
      5L -> bm25(5, 21, Seq(("join", 1L, 3L), ("scan", 4L, 2L)), 6))
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(got.map(_._1).toSet === Set(2L, 4L, 5L))
    exp.foreach { case (id, s) => assert(byId(id) === s, s"doc $id") }
    // n_terms_hit and contiguous ranks in score order
    assert(got.map(r => r._1 -> r._3).toMap === Map(2L -> 2L, 4L -> 1L, 5L -> 2L))
    assert(got.sortBy(_._4).map(_._4) === Seq(1L, 2L, 3L))
    assert(got.sortBy(_._4).map(_._2).reverse.sorted.reverse === got.sortBy(_._4).map(_._2))
  }

  test("rarer terms score higher at equal tf and dl") {
    val docs = Seq(
      (1L, "rare common pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common pad pad pad"),
      (4L, "common pad pad pad")).toDF("doc_id", "text")
    val top = TextAnalysis.bm25TopDocs(docs, "doc_id", "text", Seq("rare", "common"))
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(top.head === 1L, "the doc holding the rare term must rank first")
  }

  test("shorter docs outrank longer ones at equal tf (length normalization)") {
    val docs = Seq(
      (1L, "join pad"),
      (2L, "join pad pad pad pad pad pad pad")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopDocs(docs, "doc_id", "text", Seq("join"))
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("idf quantization at 1e9 does not change scores beyond 2e-9 or the ranking") {
    val exact = TextAnalysis.bm25TopDocs(corpus, "doc_id", "text", Seq("join", "scan"))
      .select("doc_id", "score", "rank").as[(Long, Double, Long)].collect().sortBy(_._1)
    val quant = TextAnalysis.bm25TopDocs(corpus, "doc_id", "text", Seq("join", "scan"),
        idfQuantize = Some(1e9))
      .select("doc_id", "score", "rank").as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(exact.map(_._1).toSeq === quant.map(_._1).toSeq)
    assert(exact.map(_._3).toSeq === quant.map(_._3).toSeq)
    exact.zip(quant).foreach { case ((_, e, _), (_, q, _)) =>
      assert(math.abs(e - q) <= 2e-9 * math.max(1.0, e))
    }
  }

  test("partitioning-invariant (1 vs 5 partitions)") {
    val one = TextAnalysis.bm25TopDocs(corpus.coalesce(1), "doc_id", "text",
      Seq("join", "scan")).select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val many = TextAnalysis.bm25TopDocs(corpus.repartition(5), "doc_id", "text",
      Seq("join", "scan")).select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(one === many)
  }

  test("topN truncates after the rank sort") {
    val got = TextAnalysis.bm25TopDocs(corpus, "doc_id", "text",
      Seq("join", "scan"), topN = 2)
      .select("doc_id", "rank").as[(Long, Long)].collect()
    assert(got.length === 2)
    assert(got.map(_._2).sorted.toSeq === Seq(1L, 2L))
  }
}
