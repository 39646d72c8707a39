package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Hashed-feature linear quality classifier: exact md5-mode scoring,
  * gradient-descent parity with a driver-side reference implementation,
  * and end-to-end separation of a marker-vocabulary corpus. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the md5 featurizer for expected values. */
  private def featMd5(tok: String, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"f:$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(4)
    Integer.parseInt(hex, 16) % dim
  }

  private def toksOf(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  test("md5-mode scoring equals the driver-side fold EXACTLY (dyadic weights)") {
    val dim = 256
    val w = QualityClassifier.md5Weights(dim)
    val docs = Seq(
      (1L, "Alpha beta ALPHA gamma"),
      (2L, "delta"),
      (3L, "   "), // blank: logit = bias exactly
      (4L, "beta beta beta beta beta"))
    val got = QualityClassifier.scoreDocs(
        docs.toDF("doc_id", "text"), "text", "doc_id",
        w.toSeq, bias = 0.125, dim = dim, md5Mode = true)
      .select("doc_id", "logit").as[(Long, Double)].collect().toMap
    docs.foreach { case (id, text) =>
      val exp = 0.125 + toksOf(text).map(t => w(featMd5(t, dim))).sum
      assert(got(id) === exp, s"doc $id") // exact ===: dyadic sums
    }
  }

  test("scoring is partitioning-invariant bit-for-bit") {
    val docs = table("documents")
    val w = QualityClassifier.md5Weights(1024).toSeq
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.scoreDocs(df, "text", "doc_id", w, 0.0, 1024, md5Mode = true)
        .select("doc_id", "logit").as[(Long, Double)].collect().toMap
    assert(run(docs.repartition(1)) === run(docs.repartition(7)))
  }

  test("train matches a driver-side reference GD loop (3 iters, collisions included)") {
    val dim = 8 // tiny: forces feature collisions through the same path
    val docs = Seq((1, "a b a", 1.0), (2, "b", 0.0), (3, "c c", 1.0))
    val df = docs.map { case (i, t, y) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y").repartition(1)
    val (w, b) = QualityClassifier.train(
      df, "text", "y", dim = dim, iters = 3, lr = 0.7, md5Mode = true)
    // reference loop over the same md5 features
    val feats = docs.map { case (_, t, y) => (toksOf(t).map(featMd5(_, dim)), y) }
    val rw = Array.fill(dim)(0.0)
    var rb = 0.0
    for (_ <- 0 until 3) {
      val gw = Array.fill(dim)(0.0)
      var gb = 0.0
      feats.foreach { case (fs, y) =>
        val z = rb + fs.map(rw).sum
        val e = 1.0 / (1.0 + math.exp(-z)) - y
        fs.foreach(j => gw(j) += e)
        gb += e
      }
      for (j <- 0 until dim) rw(j) -= 0.7 * gw(j) / feats.size
      rb -= 0.7 * gb / feats.size
    }
    w.indices.foreach(j => assert(math.abs(w(j) - rw(j)) < 1e-12, s"w($j)"))
    assert(math.abs(b - rb) < 1e-12)
    // lr = 0 is an exact no-op
    val (w0, b0) = QualityClassifier.train(df, "text", "y", dim, 3, lr = 0.0)
    assert(w0.forall(_ == 0.0) && b0 == 0.0)
  }

  test("separates a marker-vocabulary corpus on held-out docs") {
    val good = Seq("excellent", "clear", "thorough")
    val bad = Seq("spam", "junk", "gibberish")
    val noise = Seq("the", "data", "spark", "table", "row", "scan")
    def doc(i: Int, markers: Seq[String]): String =
      (0 until 12).map { k =>
        if (k % 3 == 0) markers((i + k) % markers.size)
        else noise((i * 7 + k) % noise.size)
      }.mkString(" ")
    val rows = (0 until 200).map { i =>
      val pos = i % 2 == 0
      (i.toLong, doc(i, if (pos) good else bad), if (pos) 1.0 else 0.0)
    }
    val df = rows.toDF("doc_id", "text", "y")
    val trainDf = df.filter(F.col("doc_id") % 5 =!= 0)
    val holdout = df.filter(F.col("doc_id") % 5 === 0)
    val (w, b) = QualityClassifier.train(
      trainDf, "text", "y", dim = 1024, iters = 30, lr = 1.0)
    val scored = QualityClassifier.scoreDocs(holdout, "text", "doc_id", w.toSeq, b, 1024)
      .join(holdout.select("doc_id", "y"), Seq("doc_id"))
    val acc = scored.agg(
        F.avg((F.col("keep") === (F.col("y") === 1.0)).cast("double")))
      .as[Double].head()
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // L2 shrinks the solution
    val (wl2, _) = QualityClassifier.train(
      trainDf, "text", "y", dim = 1024, iters = 30, lr = 1.0, l2 = 0.1)
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    assert(norm(wl2) < norm(w))
  }
}
