package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonMult: inverse CDF over the fixed thresholds; tail clamps at 9") {
    val us = Seq(0.0, 0.36787944117144233, 0.5, 0.99, 0.9999999)
    val got = us.toDF("u")
      .select(Bootstrap.poissonMult(F.col("u")).as("m"))
      .collect().map(_.getLong(0))
    // < t0 -> 0; exactly t0 -> 1 (strict <); 0.5 -> 1; 0.99 -> 4; tail -> 9
    assert(got.toSeq == Seq(0L, 1L, 1L, 4L, 9L))
  }

  test("minstdUniform is deterministic, id/replicate-sensitive, in [0,1), well-spread") {
    val df = Seq((1L, 0), (1L, 0), (1L, 1), (2L, 0)).toDF("id", "b")
      .select(Bootstrap.minstdUniform(F.col("id"), F.col("b")).as("u"))
    val us = df.collect().map(_.getDouble(0))
    assert(us(0) == us(1))                    // same pair, same uniform
    assert(us(0) != us(2) && us(0) != us(3))  // replicate- and id-sensitive
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    // spread sanity over a grid: the empirical mean of 64k draws sits
    // near 0.5 and all ten multiplicity bands get hit
    val grid = spark.range(1000).selectExpr("id").crossJoin(
      spark.range(64).selectExpr("id as b"))
      .select(Bootstrap.minstdUniform(F.col("id"), F.col("b")).as("u"))
    val mean = grid.agg(F.avg("u")).head().getDouble(0)
    assert(math.abs(mean - 0.5) < 0.01)
    val mults = grid.select(Bootstrap.poissonMult(F.col("u")).as("m"))
      .groupBy("m").count().collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L, 3L).subsetOf(mults))
  }

  test("minstdUniform: negative ids map through pmod — u stays in [0,1), multiplicities draw") {
    // without the pmod a negative id drives u negative -> multiplicity
    // 0 for EVERY replicate, silently excluding the row from resamples
    val us = Seq((-1L, 0), (-1000000L, 3), (-3000000000L, 63), (5L, 0))
      .toDF("id", "b")
      .select(Bootstrap.minstdUniform(F.col("id"), F.col("b")).as("u"))
      .collect().map(_.getDouble(0))
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    // negative-id rows participate: across 64 replicates the row draws
    // a nonzero multiplicity somewhere (P(all zero) ~ 1e-28)
    val mults = spark.range(64).selectExpr("id as b")
      .select(Bootstrap.poissonMult(
        Bootstrap.minstdUniform(F.lit(-42L), F.col("b"))).as("m"))
      .agg(F.sum("m")).head().getLong(0)
    assert(mults > 0L)
  }

  test("meanCI on negative ids matches the same data with shifted non-negative ids' row count") {
    val df = Seq((-3L, 10L), (-2L, 20L), (-1L, 30L), (1L, 40L), (2L, 50L))
      .toDF("id", "v")
    val r = Bootstrap.meanCI(df, "id", "v", b = 16).collect().head
    assert(r.getLong(0) == 5L && r.getDouble(1) == 30.0)
    assert(r.getDouble(5) <= r.getDouble(6)) // a real CI came out
  }

  test("diffCI/meanCI: multiplicity-0 replicate fails loudly, not with an NPE") {
    // a 1-row input: each replicate has P(e^-1) ~ 37% of drawing total
    // multiplicity 0 -> with b=64 this fires essentially surely
    val tiny = Seq((1L, 5L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Bootstrap.meanCI(tiny, "id", "v")
    }
    assert(e.getMessage.contains("multiplicity 0"))
    val tinyArms = Seq((1L, 5L, true), (2L, 7L, false), (3L, 9L, false))
      .toDF("id", "v", "arm")
    val e2 = intercept[IllegalArgumentException] {
      Bootstrap.diffCI(tinyArms, "id", "v", F.col("arm"))
    }
    assert(e2.getMessage.contains("multiplicity 0"))
  }

  test("meanCI: partitioning-invariant; CI brackets the mean; replicate count exact") {
    val df = table("lineitem")
      .select((F.col("l_orderkey") * 10 + F.col("l_linenumber")).as("id"),
        F.col("l_quantity"))
    val a = Bootstrap.meanCI(df, "id", "l_quantity").collect().head
    val b = Bootstrap.meanCI(df.repartition(17), "id", "l_quantity").collect().head
    assert(a.toSeq == b.toSeq)
    val (mean, lo, hi) = (a.getDouble(1), a.getDouble(5), a.getDouble(6))
    assert(lo < mean && mean < hi)
    assert(a.getDouble(3) <= lo && hi <= a.getDouble(4)) // band inside range
    assert(a.getLong(2) == 64L)
  }

  test("cupedTest: theta-adjustment is exact; uncorrelated covariate leaves means; invariance") {
    // y perfectly linear in x (y = 3x): theta = 3, every adjusted value
    // collapses to the same constant 3*xbar -> diff 0, variance 0, z NULL
    val lin = Seq((true, 3L, 1L), (true, 6L, 2L), (false, 9L, 3L), (false, 12L, 4L))
      .toDF("arm", "y", "x")
    val r = Bootstrap.cupedTest(lin, F.col("arm"), F.col("y"), F.col("x"))
      .collect().head
    assert(r.getDouble(2) == 3.0)                 // theta
    assert(r.getDouble(3) == r.getDouble(4))      // adjusted means equal
    assert(r.getDouble(5) == 0.0 && r.isNullAt(7)) // diff 0, z NULL (se 0)
    // constant covariate -> denominator 0 -> loud (ANSI divide is fine on
    // doubles: theta = 0/0 = NaN) — instead pin the uncorrelated case:
    // theta 0 => adjusted means are the raw means
    val unc = Seq((true, 10L, 1L), (true, 20L, 2L), (false, 30L, 1L), (false, 40L, 2L))
      .toDF("arm", "y", "x")
    val u = Bootstrap.cupedTest(unc, F.col("arm"), F.col("y"), F.col("x"))
      .collect().head
    assert(u.getDouble(2) == 10.0) // theta: y rises 10 per x here, pooled
    val ev = eventsDF
    val a = Bootstrap.cupedTest(ev, F.col("user_id") % 2 === 0,
      F.round(F.col("value") * 100), F.col("event_id") % 97).collect().head
    val b = Bootstrap.cupedTest(ev.repartition(19), F.col("user_id") % 2 === 0,
      F.round(F.col("value") * 100), F.col("event_id") % 97).collect().head
    assert(a.toSeq == b.toSeq)
    assert(a.getLong(0) > 0 && a.getLong(1) > 0)
  }

  test("proportionTest: hand counts and z; empty/degenerate arms give NULL z") {
    // arm1: 3 rows 2 successes; arm2: 2 rows 0 successes
    val df = Seq((true, true), (true, true), (true, false),
      (false, false), (false, false)).toDF("arm", "ok")
    val r = Bootstrap.proportionTest(df, F.col("arm"), F.col("ok")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (3L, 2L, 2L, 0L))
    val pp = 2.0 / 5.0
    val se = math.sqrt(pp * (1.0 - pp) * (1.0 / 3.0 + 1.0 / 2.0))
    assert(r.getDouble(6) == (2.0 / 3.0 - 0.0) / se)
    // all-failure outcome: pooled rate 0 -> NULL z
    val deg = Seq((true, false), (false, false)).toDF("arm", "ok")
    assert(Bootstrap.proportionTest(deg, F.col("arm"), F.col("ok"))
      .collect().head.isNullAt(6))
  }

  test("diffCI: constant arms give a degenerate band at the true difference") {
    import spark.implicits._
    val df = ((0 until 50).map(i => (i.toLong, 10L, true)) ++
      (50 until 100).map(i => (i.toLong, 0L, false))).toDF("id", "v", "arm")
    val r = Bootstrap.diffCI(df, "id", "v", F.col("arm")).collect().head
    assert(r.getLong(0) == 50L && r.getLong(1) == 50L)
    assert(r.getDouble(2) == 10.0)
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 10.0) // every replicate diff = 10
  }

  test("diffCI: partitioning-invariant; band brackets the full-sample difference") {
    val ev = eventsDF.select(F.col("event_id"),
      F.round(F.col("value") * 100).as("v"),
      (F.col("user_id") % 2 === 0).as("arm"))
    val a = Bootstrap.diffCI(ev, "event_id", "v", F.col("arm")).collect().head
    val b = Bootstrap.diffCI(ev.repartition(17), "event_id", "v", F.col("arm"))
      .collect().head
    assert(a.toSeq == b.toSeq)
    assert(a.getDouble(4) <= a.getDouble(5))
  }
}
