package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** Native BPE encoder ([[graft.functions.BpeEncodeTokens]]) ≡ the
  * regexp-fold oracle bridge ([[TextAnalysis.bpeSegment]]) — the pin
  * that lets the production-vocabulary path inherit the fold's
  * training-replay oracle. */
class BpeEncodeSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def bothEncodings(df: DataFrame, merges: Seq[(String, String)]) = {
    df.select(
        TextAnalysis.bpeSegment(F.col("text"), merges).as("fold"),
        TextAnalysis.bpeSegmentNative(F.col("text"), merges).as("native"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1)))
  }

  private def assertEquiv(df: DataFrame, merges: Seq[(String, String)]): Unit =
    bothEncodings(df, merges).foreach { case (fold, native) =>
      assert(native == fold, s"native=$native fold=$fold merges=$merges")
    }

  test("native == fold on the corpus with a trained merge table") {
    val docs = table("documents")
    val ms = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 8)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(ms.nonEmpty)
    assertEquiv(docs, ms)
  }

  test("native == fold on adversarial run/repeat words") {
    import spark.implicits._
    val docs = Seq("aaaaaaa", "abababab", "aabbaabb", "abc abcd abcde",
      "aaab baaa", "a b ab ba", "xyxyxyx yy", "")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // trained-shaped tables
    assertEquiv(docs, Seq(("a", "a"), ("aa", "a"), ("aa", "aa")))
    assertEquiv(docs, Seq(("a", "b"), ("ab", "ab"), ("b", "a"), ("ba", "ba")))
    // rank-INCONSISTENT table: rank 0's pair can only exist after rank 1
    // applies; the fold never revisits it, and neither may the native
    // encoder (the lastApplied cursor is exactly this rule)
    assertEquiv(docs, Seq(("ab", "ab"), ("a", "b")))
    assertEquiv(docs, Seq(("aa", "aa"), ("a", "a"), ("aa", "aa")))
    // duplicate pair entries: the fold applies BOTH copies, and the
    // later one is NOT a no-op when the pair was recreated in between
    // (here (aa,aa) fires only at its second listing, after (a,a))
    assertEquiv(docs, Seq(("a", "b"), ("a", "b"), ("ab", "c")))
    assertEquiv(docs, Seq(("aa", "aa"), ("a", "a"), ("aa", "aa")))
    assertEquiv(docs, Seq(("ab", "ab"), ("a", "b"), ("ab", "ab"), ("abab", "ab")))
  }

  test("native == fold under randomized tables and words") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab0"
    def randWord() =
      (0 until (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(3))).mkString
    val docs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(3)(randWord()).mkString(" "))).toDF("doc_id", "text")
    (0 until 10).foreach { _ =>
      // random pairs of random (possibly multi-char) symbols — most are
      // unreachable, some fire, some are rank-inconsistent; every table
      // must still agree with the fold
      val merges = (0 until (1 + rnd.nextInt(6))).map { _ =>
        (randWord().take(1 + rnd.nextInt(2)), randWord().take(1 + rnd.nextInt(2)))
      }
      assertEquiv(docs, merges)
    }
  }

  test("native encoder: empty merge table, null text, non-alnum tokens") {
    import spark.implicits._
    val docs = Seq((1L, "abc DEF? x9"), (2L, null.asInstanceOf[String]),
      (3L, "   ")).toDF("doc_id", "text")
    val got = docs.select(F.col("doc_id"),
        TextAnalysis.bpeSegmentNative(F.col("text"), Nil).as("syms"))
      .orderBy("doc_id").collect()
    // no merges: per-char symbols of the [a-z0-9]+ tokens ("DEF?" lowers
    // to "def?" and is dropped by the alnum gate)
    assert(got(0).getSeq[String](1) == Seq("a", "b", "c", "x", "9"))
    assert(got(1).isNullAt(1))
    assert(got(2).getSeq[String](1) == Seq.empty)
  }

  test("native encoder handles a large merge table cheaply (no plan growth)") {
    import spark.implicits._
    // 20k merges, nearly all unreachable: the point is the PLAN — one
    // expression node holding the table as a reference object. The fold
    // shape would be 20k regex nodes here.
    val big = (0 until 20000).map(i => (s"q${i}", s"z${i}")) ++
      Seq(("a", "b"), ("ab", "c"))
    val docs = Seq((1L, "abc abd")).toDF("doc_id", "text")
    val out = docs.select(
        TextAnalysis.bpeSegmentNative(F.col("text"), big).as("syms"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("abc", "ab", "d"))
  }
}
