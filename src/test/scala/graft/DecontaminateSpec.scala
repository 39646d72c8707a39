package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.{Decontaminate, Dedup}

/** Decontamination overlap vs a string-shingle recomputation (the Spark
  * side matches 64-bit shingle ids; strings are the semantics oracle). */
class DecontaminateSpec extends SparkSpec {

  test("overlaps equals string-shingle recomputation on documents") {
    val docs = table("documents")
    val corpus = docs.filter(F.col("source") =!= "src0")
    val evalSet = docs.filter(F.col("source") === "src0")
    val got = Decontaminate.overlaps(corpus, evalSet, "text", "doc_id", n = 13)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

    val evalGrams = evalSet
      .select(F.explode(Dedup.shingles(F.col("text"), 13)).as("g")).distinct()
    val expected = corpus
      .select(F.col("doc_id"), Dedup.shingles(F.col("text"), 13).as("gs"))
      .select(F.col("doc_id"), F.size(F.col("gs")).cast("long").as("n_grams"),
        F.explode(F.col("gs")).as("g"))
      .join(evalGrams, "g")
      .groupBy("doc_id", "n_grams").agg(F.count(F.lit(1)).as("hits"))
      .collect().map { r =>
        val (n, h) = (r.getLong(1), r.getLong(2))
        (r.getLong(0), (n, h, h.toDouble / n.toDouble))
      }.toMap

    assert(got == expected)
    assert(got.nonEmpty, "fixture should contain cross-source near-dups")
    got.values.foreach { case (n, h, frac) =>
      assert(h >= 1L && h <= n && frac > 0.0 && frac <= 1.0)
    }
  }

  test("disjoint corpora have no overlaps") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val b = Seq((2L, "one two three four")).toDF("doc_id", "text")
    assert(Decontaminate.overlaps(a, b, "text", "doc_id", n = 3).count() == 0L)
  }

  test("identical doc is fully contaminated") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val a = Seq((1L, text)).toDF("doc_id", "text")
    val b = Seq((9L, text)).toDF("doc_id", "text")
    val r = Decontaminate.overlaps(a, b, "text", "doc_id", n = 13).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 8L && r(0).getLong(2) == 8L && r(0).getDouble(3) == 1.0)
  }

  test("splitLeakage flags only cross-split near-dup pairs") {
    import spark.implicits._
    val near1 = "alpha beta gamma delta epsilon zeta eta theta"
    val near2 = "alpha beta gamma delta epsilon zeta eta iota" // high Jaccard with near1
    val docs = Seq(
      (1L, near1, "train"),
      (2L, near2, "test"),   // cross-split near-dup of 1 -> flagged
      (3L, near1, "train"),  // same-split dup of 1 -> NOT flagged
      (4L, "completely different words entirely here now", "test"))
      .toDF("doc_id", "text", "split")
    val got = graft.pipeline.Decontaminate.splitLeakage(
      docs, "text", "doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4)))
    assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 2L), (2L, 3L)),
      s"got ${got.toSeq}")
    got.foreach { case (_, _, sa, sb) => assert(sa != sb) }
  }
}
