package graft.pipeline

import graft.SparkSpec

/** C4 line-level cleaning rules: each gate exercised on hand-built
  * pages (terminal punctuation, min words, line ban, sentence floor,
  * doc ban), plus null-safety. */
class C4CleanSpec extends SparkSpec {

  private def run(pages: Seq[(Long, String)], minSentences: Int = 2) = {
    import spark.implicits._
    TextAnalysis.c4Clean(pages.toDF("id", "page"), "page",
      minSentences = minSentences)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
  }

  test("line gates: terminal punctuation, word floor, javascript ban") {
    val out = run(Seq(
      (1L, "a good first sentence.\nno terminal punct here\ntiny.\n" +
        "please enable javascript now.\nanother keeper, truly!")))
    val r = out(1L)
    assert(r.getAs[Long]("n_lines") == 5L)
    // kept: line 1 and line 5 — line 2 lacks punctuation, line 3 has
    // one word, line 4 mentions javascript
    assert(r.getAs[Long]("n_lines_kept") == 2L)
    assert(r.getAs[String]("clean_text") ==
      "a good first sentence.\nanother keeper, truly!")
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Boolean]("c4_keep"))
    assert(r.isNullAt(r.fieldIndex("c4_drop_reason")))
  }

  test("document gates: sentence floor and banned content") {
    val out = run(Seq(
      (1L, "only one real sentence here."),
      (2L, "fine first sentence.\nthis page has lorem ipsum inside it."),
      (3L, "curly brace pages { get dropped too.\nsecond sentence stays.")))
    assert(!out(1L).getAs[Boolean]("c4_keep"))
    assert(out(1L).getAs[String]("c4_drop_reason") == "too_few_sentences")
    assert(!out(2L).getAs[Boolean]("c4_keep"))
    assert(out(2L).getAs[String]("c4_drop_reason") == "banned_content")
    assert(!out(3L).getAs[Boolean]("c4_keep"))
    assert(out(3L).getAs[String]("c4_drop_reason") == "banned_content")
  }

  test("quoted-line retention and null text") {
    val out = run(Seq(
      (1L, "\"a quoted ending counts too\"\nand a second one does as well."),
      (2L, null)), minSentences = 1)
    // the quote-terminated line is kept but contributes no [.!?]
    assert(out(1L).getAs[Long]("n_lines_kept") == 2L)
    assert(out(1L).getAs[Long]("n_sentences") == 1L)
    assert(out(1L).getAs[Boolean]("c4_keep"))
    assert(out(2L).getAs[Long]("n_lines_kept") == 0L)
    assert(!out(2L).getAs[Boolean]("c4_keep"))
    assert(out(2L).getAs[String]("c4_drop_reason") == "too_few_sentences")
  }

  test("charBigramCrossEntropy: hand-computed bits on a 2-doc corpus") {
    import spark.implicits._
    // doc1 "aa" → bigrams [aa]; doc2 "aab" → [aa, ab]
    // counts: aa=2, ab=1, total=3
    val out = TextAnalysis.charBigramCrossEntropy(
      Seq((1L, "aa"), (2L, "aab")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("bits_per_bigram"))).toMap
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2 - -lg2(2.0 / 3)) < 1e-12)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - (-lg2(2.0 / 3) - lg2(1.0 / 3)) / 2) < 1e-12)
  }

  test("charBigramCrossEntropy: gibberish scores in the high tail of the real corpus") {
    import spark.implicits._
    val docs = table("documents").select("doc_id", "text").limit(200)
      .unionByName(Seq((99991L, "qzxj wvqk zzpq xjqw vvkk zzzz qqqq"),
        (99992L, "the table has a fast row scan and a hash value"))
        .toDF("doc_id", "text"))
    val scored = TextAnalysis.charBigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("bits_per_bigram"))
      .toMap
    val corpusMax = scored.filter(_._1 < 99991L).values.max
    assert(scored(99991L) > corpusMax,
      s"gibberish ${scored(99991L)} should exceed corpus max $corpusMax")
    assert(scored(99992L) < scored(99991L))
  }

  test("plan: bigram counts broadcast back — no bigram-keyed window, joins broadcast") {
    val out = TextAnalysis.charBigramCrossEntropy(
      table("documents").select("doc_id", "text"), "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"count table must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join anywhere:\n${plan.take(3000)}")
  }
}
