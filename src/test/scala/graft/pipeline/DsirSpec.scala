package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importanceWeights: hand-checked smoothed log ratios sum per document") {
    // raw: d1 = "aa aa bb", d2 = "cc"; target: "aa aa aa"
    // vocab = {aa, bb, cc}; cr: aa 2, bb 1, cc 1; ct: aa 3
    // Nr = 4, Nt = 3, V = 3
    val raw = Seq((1L, "aa aa bb"), (2L, "cc")).toDF("doc_id", "text")
    val tgt = Seq(Tuple1("aa aa aa")).toDF("text")
    val out = Dsir.importanceWeights(raw, tgt, "text", "doc_id")
      .orderBy("doc_id").collect()
    val lrAa = math.floor(1e6 * math.log((4.0 * 7.0) / (3.0 * 6.0))).toLong
    val lrBb = math.floor(1e6 * math.log((1.0 * 7.0) / (2.0 * 6.0))).toLong
    val lrCc = lrBb // same counts as bb
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L)
    assert(out(0).getLong(2) == 2 * lrAa + lrBb)
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 1L)
    assert(out(1).getLong(2) == lrCc)
    // target-like doc scores higher per token than the OOV-ish one
    assert(out(0).getDouble(3) > out(1).getDouble(3))
  }

  test("importanceWeights: empty/NULL raw docs absent; token weights exact ints") {
    val raw = Seq((1L, "aa"), (2L, ""), (3L, null.asInstanceOf[String]), (4L, "  "))
      .toDF("doc_id", "text")
    val tgt = Seq(Tuple1("aa bb")).toDF("text")
    val out = Dsir.importanceWeights(raw, tgt, "text", "doc_id").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  test("importanceWeights: partitioning-invariant on the documents fixture") {
    val docs = table("documents")
    val raw = docs.filter(F.col("source") =!= "src0")
    val tgt = docs.filter(F.col("source") === "src0")
    val a = Dsir.importanceWeights(raw, tgt, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Dsir.importanceWeights(raw.repartition(13), tgt.repartition(7),
      "text", "doc_id").orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("selectTopK: returns k rows ordered by normalized weight then id") {
    val docs = table("documents")
    val sel = Dsir.selectTopK(docs.filter(F.col("source") =!= "src0"),
      docs.filter(F.col("source") === "src0"), "text", "doc_id", 5).collect()
    assert(sel.length == 5)
    val w = sel.map(r => (r.getDouble(3), r.getLong(0)))
    assert(w.sliding(2).forall { case Array((w1, i1), (w2, i2)) =>
      w1 > w2 || (w1 == w2 && i1 < i2) })
  }
}
