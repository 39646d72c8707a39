package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Corpus comparison: snapshot diff statuses, distinct-content overlap
  * measures, bottom-k containment math, and code-stat arithmetic. */
class CorpusCompareSpec extends SparkSpec {

  test("diff: added/removed/changed/unchanged classified per id") {
    import spark.implicits._
    val v1 = Seq((1L, "s0", "alpha"), (2L, "s0", "beta"), (3L, "s1", "gamma"))
      .toDF("doc_id", "source", "text")
    val v2 = Seq((1L, "s0", "alpha"), (3L, "s1", "gamma CHANGED"),
      (4L, "s1", "delta")).toDF("doc_id", "source", "text")
    val got = CorpusCompare.diff(v1, v2, "doc_id", "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("unchanged", "s0") -> 1L, ("removed", "s0") -> 1L,
      ("changed", "s1") -> 1L, ("added", "s1") -> 1L))
  }

  test("overlap: jaccard and containments from distinct content") {
    import spark.implicits._
    // A = {x, y, z}, B = {y, z, w, w-dup} — distinct B = {y, z, w}
    val a = Seq("x", "y", "z").toDF("text")
    val b = Seq("y", "z", "w", "w").toDF("text")
    val r = CorpusCompare.overlap(a, b, "text").collect().head
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_common") == 2L)
    assert(r.getAs[Double]("jaccard") == 0.5)        // 2 / 4
    assert(r.getAs[Double]("containment_a") == 2.0 / 3.0)
    assert(r.getAs[Double]("containment_b") == 2.0 / 3.0)
  }

  test("containmentBottomK: identical doc fully contained, disjoint doc at zero") {
    import spark.implicits._
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // = train doc
      (11L, "completely different words here nothing shared at all ever"))
      .toDF("doc_id", "text")
    val got = CorpusCompare.containmentBottomK(eval, train, "doc_id", "text",
      k = 4, shingleWidth = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("k_used"), r.getAs[Long]("k_hit"),
          r.getAs[Double]("containment"))).toMap
    assert(got(10L) == ((4L, 4L, 1.0)))
    assert(got(11L) == ((4L, 0L, 0.0)))
  }

  test("containmentBottomK: k caps the sketch; short docs use all shingles") {
    import spark.implicits._
    val train = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    // 3 words → 1 shingle; k=4 must report k_used=1
    val eval = Seq((10L, "a b c")).toDF("doc_id", "text")
    val r = CorpusCompare.containmentBottomK(eval, train, "doc_id", "text",
      k = 4, shingleWidth = 3).collect().head
    assert(r.getAs[Long]("k_used") == 1L)
    assert(r.getAs[Long]("k_hit") == 1L)  // "a b c" is a train shingle
  }

  test("codeStats: line/indent/brace arithmetic on a hand-built doc") {
    import spark.implicits._
    //               1          2           3     4
    val code = "fn main() {\n  let x=1;\n}\nnot indented"
    val df = Seq(("code", code)).toDF("source", "text")
    val r = CorpusCompare.codeStats(df, "source", "text").collect().head
    assert(r.getAs[Long]("n_docs") == 1L)
    assert(r.getAs[Long]("total_lines") == 4L)
    assert(r.getAs[Long]("total_chars") == code.length.toLong)
    assert(r.getAs[Double]("indent_frac") == 0.25)   // only line 2
    assert(r.getAs[Double]("brace_density") == 2.0 / code.length)
    assert(r.getAs[Double]("semi_density") == 1.0 / code.length)
    assert(r.getAs[Double]("mean_line_len") == code.length.toDouble / 4.0)
  }

  test("codeStats: trailing newline yields an empty final line, counted") {
    import spark.implicits._
    val df = Seq(("s", "a\n")).toDF("source", "text")
    val r = CorpusCompare.codeStats(df, "source", "text").collect().head
    assert(r.getAs[Long]("total_lines") == 2L)
  }
}
