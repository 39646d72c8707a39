package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: output multiset equals the plain join, hot key included") {
    // one mega-key (9: x10k rows), small side with duplicate matches on 9
    val big = spark.range(10000L).select(F.lit(9L).as("k"), F.col("id").as("v"))
      .unionByName((1L to 50L).map(i => (i, -i)).toDF("k", "v"))
    val small = Seq((9L, "hot"), (9L, "hot2"), (1L, "a"), (2L, "b"))
      .toDF("k", "tag")
    val plain = big.join(small, Seq("k")).groupBy("k", "tag")
      .agg(F.count(F.lit(1)).as("n"), F.sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", saltFactor = 7)
      .groupBy("k", "tag").agg(F.count(F.lit(1)).as("n"), F.sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin: left join keeps unmatched big rows exactly once") {
    val big = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val small = Seq((1L, "a")).toDF("k", "tag")
    val got = SkewJoin.saltedJoin(big, small, "k", saltFactor = 4, joinType = "left")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, 10L, Some("a")), (2L, 20L, None), (3L, 30L, None)))
  }

  test("saltedJoin: joins on (key, salt); right/full rejected loudly") {
    val big = Seq((1L, 1L)).toDF("k", "v")
    val small = Seq((1L, "a")).toDF("k", "tag")
    val plan = SkewJoin.saltedJoin(big, small, "k", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt must be a join key:\n$plan")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", 4, joinType = "full")
    }
    assert(e.getMessage.contains("inner/left"))
  }
}
