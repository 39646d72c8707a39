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
}
