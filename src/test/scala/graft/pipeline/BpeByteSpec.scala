package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** Byte-level BPE mode ([[TextAnalysis.bpeTrainMergesFast]]
  * `byteLevel = true` + [[TextAnalysis.bpeSegmentBytes]]): the GPT-2
  * family's pretokenizer + byte alphabet as opt-in, leaving default
  * mode bit-identical. */
class BpeByteSpec extends SparkSpec {
  import spark.implicits._

  test("bytePretokens: space-prefixed runs, every script kept, case preserved") {
    val got = Seq(Tuple1("Hello wörld 42, naïve  café!"))
      .toDF("text")
      .select(TextAnalysis.bytePretokens(F.col("text")).as("t"))
      .head().getSeq[String](0)
    assert(got == Seq("Hello", " wörld", " 42", ",", " naïve", " café", "!"))
  }

  test("byteHex: lowercase hex of UTF-8 bytes (multi-byte chars covered)") {
    val got = Seq(Tuple1(" é")).toDF("t")
      .select(TextAnalysis.byteHex(F.col("t"))).head().getString(0)
    assert(got == "20c3a9") // space 0x20, é = C3 A9
  }

  test("byte training merges hex-pair symbols; hand-checkable top merge") {
    // "ab ab ab cd": pretokens "ab"," ab"," ab"," cd" -> hex words
    // 6162 / 206162 x2 / 206364; top adjacent pair is (61,62) x3
    val df = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrainMergesFast(df, "text", rounds = 2,
      byteLevel = true).orderBy("round").collect()
    assert(m(0).getString(1) == "61" && m(0).getString(2) == "62")
    assert(m(0).getLong(4) == 3L)
    // round 2: (20, 6162) x2 beats (20, 63) x1 etc.
    assert(m(1).getString(1) == "20" && m(1).getString(2) == "6162")
    assert(m(1).getLong(4) == 2L)
  }

  test("bpeSegmentBytes: native width-2 encode applies the trained merges") {
    val df = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainMergesFast(df, "text", rounds = 2,
      byteLevel = true).orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val syms = df.select(TextAnalysis.bpeSegmentBytes(F.col("text"), merges))
      .head().getSeq[String](0)
    // "ab" -> 6162; " ab" -> 206162 (both merges applied); " cd" -> 20,63,64
    assert(syms == Seq("6162", "206162", "206162", "20", "63", "64"))
  }

  test("default mode drops non-ASCII words from the count; byte mode prices them") {
    val df = Seq((1L, "naïve café 北京 привет")).toDF("doc_id", "text")
    val defaultSyms = df.select(F.size(
        TextAnalysis.bpeSegmentNative(F.col("text"), Seq.empty))).head().getInt(0)
    val byteSyms = df.select(F.size(
        TextAnalysis.bpeSegmentBytes(F.col("text"), Seq.empty))).head().getInt(0)
    // default [a-z0-9]+ cut: every word has non-ASCII -> 0 symbols (the
    // fertility mispricing byte mode exists to fix)
    assert(defaultSyms == 0)
    // byte mode: one symbol per UTF-8 byte of every pretoken
    val expected = Seq("naïve", " café", " 北京", " привет")
      .map(_.getBytes("UTF-8").length).sum
    assert(byteSyms == expected)
  }

  test("byte mode trains on the corpus; merges are hex pairs; default hashes untouched") {
    val docs = table("documents")
    val m = TextAnalysis.bpeTrainMergesFast(docs, "text", rounds = 4,
      byteLevel = true).collect()
    assert(m.length == 4)
    assert(m.forall(r => r.getString(1).matches("[0-9a-f]+") &&
      r.getString(2).matches("[0-9a-f]+")))
    // default mode result is byte-for-byte what it was (no byteLevel leak)
    val d1 = TextAnalysis.bpeTrainMergesFast(docs, "text", rounds = 3)
      .collect().map(_.toSeq)
    val d2 = TextAnalysis.bpeTrainMergesFast(docs, "text", rounds = 3,
      byteLevel = false).collect().map(_.toSeq)
    assert(d1.toSeq == d2.toSeq)
  }

  test("native encoder symWidth=2: odd trailing chunk kept whole (defensive)") {
    val syms = Seq(Tuple1(Seq("abcde"))).toDF("toks")
      .select(graft.functions.BpeEncode.bpe_encode_tokens(
        F.col("toks"), Seq(("ab", "cd")), symWidth = 2))
      .head().getSeq[String](0)
    assert(syms == Seq("abcd", "e"))
  }
}
