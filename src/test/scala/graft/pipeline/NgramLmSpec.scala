package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** N-gram LM perplexity scoring: hand-computed smoothed probabilities,
  * the unseen-context 1/V floor, self-scoring ordering, hashed-gram
  * parity, and bit-for-bit partitioning invariance of the ordered
  * fold. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bigram LM matches hand-computed add-k probabilities") {
    val train = df(1L -> "a b a b", 2L -> "a b c")
    // counts: "a b"->3, "b a"->1, "b c"->1; ctx "a"->3, "b"->2; V=3
    val score = df(10L -> "a b c", 11L -> "z z", 12L -> "a", 13L -> "  ")
    val got = TextAnalysis.ngramLmScore(train, score, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ce10 = -(math.log(3.5 / 4.5) + math.log(1.5 / 3.5)) / 2
    assert(got(10L)._1 === 2L)
    assert(math.abs(got(10L)._2 - ce10) < 1e-12)
    // fully-unseen context: P = k/(k*V) = 1/V exactly, per gram
    assert(got(11L) === ((1L, math.log(3.0))))
    // below n tokens / blank: zero grams, zero ce
    assert(got(12L) === ((0L, 0.0)))
    assert(got(13L) === ((0L, 0.0)))
  }

  test("self-scoring ranks boilerplate below novel text") {
    val common = (1L to 20L).map(i => i -> "the quick brown fox jumps over the lazy dog")
    val odd = Seq(99L -> "zephyr quixotic brambles meander obsidian twilight harbors")
    val corpus = df((common ++ odd): _*)
    val got = TextAnalysis.ngramLmScore(corpus, corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(99L) > got(1L) * 2,
      s"novel doc should score much higher ce: ${got(99L)} vs ${got(1L)}")
  }

  test("hashGrams=true matches the string-keyed scores (no-collision fixture)") {
    val corpus = df((1L to 30L).map(i =>
      i -> s"alpha beta gamma token$i delta epsilon token${i % 7}"): _*)
    def run(hash: Boolean) =
      TextAnalysis.ngramLmScore(corpus, corpus, "text", "doc_id", hashGrams = hash)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val (s, h) = (run(false), run(true))
    s.foreach { case (id, ce) =>
      assert(math.abs(h(id) - ce) < 1e-9, s"doc $id") // fold order differs
    }
  }

  test("stupid backoff matches hand-computed cascade at every order") {
    val train = df(1L -> "a b c", 2L -> "a b d", 3L -> "b c")
    // c1: a2 b3 c2 d1 (N=8, V=4); c2: "a b"2 "b c"2 "b d"1;
    // c3: "a b c"1 "a b d"1
    val score = df(
      10L -> "a b c", // trigram hit: 1 / c2("a b") = 0.5
      11L -> "c b c", // bigram backoff: a * c2("b c")/c1(b) = a*2/3
      12L -> "x y d", // unigram base: a^2 * (1+0.5)/(8+0.5*4)
      13L -> "a b x") // unseen everywhere: a^2 * 0.5/10
    val a = 0.4
    val got = TextAnalysis.stupidBackoffScore(train, score, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def ce(p: Double) = -math.log(p)
    assert(got(10L)._1 === 1L)
    assert(math.abs(got(10L)._2 - ce(1.0 / 2.0)) < 1e-12)
    assert(math.abs(got(11L)._2 - ce(a * 2.0 / 3.0)) < 1e-12)
    assert(math.abs(got(12L)._2 - ce(math.pow(a, 2) * 1.5 / 10.0)) < 1e-12)
    assert(math.abs(got(13L)._2 - ce(math.pow(a, 2) * 0.5 / 10.0)) < 1e-12)
  }

  test("stupid backoff: hashed-gram parity and quantized partitioning invariance") {
    val docs = table("documents").limit(120)
    def run(hash: Boolean, parts: Int) =
      TextAnalysis.stupidBackoffScore(
        docs.repartition(parts), docs.repartition(parts), "text", "doc_id",
        alpha = 0.5, lnQuantize = Some(1e9), hashGrams = hash)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val base = run(hash = false, parts = 1)
    val hashed = run(hash = true, parts = 1)
    base.foreach { case (id, (ng, ce)) =>
      assert(hashed(id)._1 === ng)
      assert(math.abs(hashed(id)._2 - ce) < 1e-9, s"doc $id")
    }
    assert(run(hash = false, parts = 7) === base) // ordered fold: bit-exact
  }

  test("quantized-ln scoring is partitioning-invariant bit-for-bit") {
    val docs = table("documents")
    def run(parts: Int) =
      TextAnalysis.ngramLmScore(
        docs.repartition(parts), docs.repartition(parts), "text", "doc_id",
        lnQuantize = Some(1e9))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(1) === run(7))
  }
}
