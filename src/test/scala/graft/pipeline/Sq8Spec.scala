package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Int8 scalar quantization: global symmetric scale training,
  * floor-mapping edge cases, exact quantized-cosine ranking, and
  * recall against the float brute force on the real fixture. */
class Sq8Spec extends SparkSpec {

  test("sq8Train returns the corpus-wide max |x| (float or double elements)") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f, -10.0f)), (2L, Seq(5.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.sq8Train(df, "embedding") == 10.0)
    val dd = Seq((1L, Seq(0.5, -10.0)), (2L, Seq(5.0, 2.0))).toDF("vec_id", "embedding")
    assert(Similarity.sq8Train(dd, "embedding") == 10.0)
  }

  test("sq8Quantize: symmetric floor mapping, zero stays zero, zero scale maps all to 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.0f)),
      (2L, Seq(0.5f, -0.5f, 0.25f))).toDF("vec_id", "embedding")
    val got = df.select(F.col("vec_id"),
        Similarity.sq8Quantize(F.col("embedding"), 1.0).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(127L, -127L, 0L))
    assert(got(2L) == Seq(63L, -64L, 31L)) // floor: 63.5->63, -63.5->-64, 31.75->31
    val zeros = df.select(Similarity.sq8Quantize(F.col("embedding"), 0.0).as("q"))
      .collect().map(_.getSeq[Long](0))
    assert(zeros.forall(_.forall(_ == 0L)))
  }

  test("sq8TopK ranks by quantized cosine (hand-separable corpus, exact scores)") {
    import spark.implicits._
    // query [1,0]: same-axis 2 first (cos exactly 1), diagonal 4, orthogonal 3
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val got = Similarity.sq8TopK(corpus, corpus.filter(F.col("vec_id") === 1L), k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(2L, 4L, 3L))
    // q(1)=(127,0), q(2)=(114,0), q(4)=(63,63): cosines from exact integers
    assert(got(0)._2 == 1.0)
    assert(got(1)._2 == 8001.0 / (math.sqrt(7938.0) * math.sqrt(16129.0)))
    assert(got(2)._2 == 0.0)
  }

  test("quantized recall@5 vs float brute force stays high on the fixture") {
    val emb = table("embeddings")
    val queries = emb.filter(F.col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.sq8TopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("sq8TopK is partitioning-invariant (integer statistics, bounded heap)") {
    val emb = table("embeddings")
    val q = emb.filter(F.col("vec_id") < 5)
    val a = Similarity.sq8TopK(emb.coalesce(1), q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.sq8TopK(emb.repartition(7), q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }
}
