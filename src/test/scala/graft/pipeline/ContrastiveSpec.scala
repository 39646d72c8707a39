package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  test("tripletsFromPairs: negatives never collide with either member, ever") {
    // exhaustive: all ordered pairs over a 6-id universe
    val pairs = (for (a <- 0L until 6L; b <- 0L until 6L if a != b)
      yield (a, b)).toDF("a", "b")
    val got = Contrastive.tripletsFromPairs(pairs, "a", "b", 6).collect()
    assert(got.length == 30)
    got.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n >= 0L && n < 6L)
      assert(n != a && n != p)
    }
  }

  test("tripletsFromPairs: deterministic, equal/NULL pairs drop, loud small universe") {
    val pairs = Seq((1L, 3L), (1L, 3L), (2L, 2L)).toDF("a", "b")
    val got = Contrastive.tripletsFromPairs(pairs, "a", "b", 5).collect()
    assert(got.length == 2) // (2,2) dropped
    assert(got(0).getLong(2) == got(1).getLong(2)) // same pair, same negative
    intercept[IllegalArgumentException] {
      Contrastive.tripletsFromPairs(pairs, "a", "b", 2)
    }
  }

  test("tripletsFromPairs: negatives spread over the universe (not a constant)") {
    val pairs = (0L until 200L).map(i => (i, i + 200L)).toDF("a", "b")
    val negs = Contrastive.tripletsFromPairs(pairs, "a", "b", 400)
      .select("neg").distinct().count()
    assert(negs > 100) // 200 draws over 398 candidates: far from degenerate
  }
}
