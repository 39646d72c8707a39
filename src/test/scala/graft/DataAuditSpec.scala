package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.DataAudit
import graft.analysis.DataAudit.FkRelation

/** Dataset-integrity audits: referential integrity (orphan accounting,
  * null handling, broadcast parity), k-anonymity thresholds, schema-drift
  * statuses, and Benford digit extraction. */
class DataAuditSpec extends SparkSpec {

  test("referentialIntegrity: orphan rows vs keys, null FKs excluded") {
    import spark.implicits._
    // child: key 1 ok (×2), key 9 orphan (×3), key 8 orphan (×1), 2 nulls
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(9L),
      Some(8L), None, None).toDF("fk").repartition(3)
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataAudit.referentialIntegrity(
      Seq(FkRelation("c->p", child, "fk", parent, "pk"))).collect().head
    assert(r.getAs[Long]("child_rows") == 8L)
    assert(r.getAs[Long]("null_fk") == 2L)
    assert(r.getAs[Long]("distinct_fk") == 3L)  // 1, 8, 9
    assert(r.getAs[Long]("orphan_rows") == 4L)  // 9×3 + 8×1
    assert(r.getAs[Long]("orphan_keys") == 2L)  // {8, 9}
  }

  test("referentialIntegrity: broadcast and shuffle paths agree; intact relation is clean") {
    import spark.implicits._
    val child = (1L to 100L).map(i => i % 10).toDF("fk")
    val parent = (0L to 9L).toDF("pk")
    val Seq(bc, sh) = Seq(true, false).map { b =>
      DataAudit.referentialIntegrity(
        Seq(FkRelation("r", child, "fk", parent, "pk", broadcastParent = b)))
        .collect().head
    }
    assert(bc == sh)
    assert(bc.getAs[Long]("orphan_rows") == 0L && bc.getAs[Long]("orphan_keys") == 0L)
    // the broadcast flag actually produces a broadcast join
    val plan = DataAudit.referentialIntegrity(
      Seq(FkRelation("r", child, "fk", parent, "pk", broadcastParent = true)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast join in:\n$plan")
  }

  test("kAnonymity: per-k group accounting over skewed class sizes") {
    import spark.implicits._
    // classes: (a,×1), (b,×3), (c,×6) — n=10, groups=3, min=1
    val df = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(6)("c"))
      .zipWithIndex.map { case (q, i) => (q, i) }.toDF("qi", "v")
      .repartition(4)
    val rows = DataAudit.kAnonymity(df, Seq("qi"), Seq(2, 4, 10))
      .collect().map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_groups"),
          r.getAs[Long]("min_group_size"), r.getAs[Long]("groups_below_k"),
          r.getAs[Long]("rows_below_k"), r.getAs[Double]("frac_rows_below_k")))
      .toMap
    assert(rows(2) == ((10L, 3L, 1L, 1L, 1L, 0.1)))
    assert(rows(4) == ((10L, 3L, 1L, 2L, 4L, 0.4)))
    assert(rows(10) == ((10L, 3L, 1L, 3L, 10L, 1.0)))
  }

  test("schemaDrift: all four statuses with null accounting") {
    import spark.implicits._
    val a = Seq((1L, Some("x"), Some(1.0)), (2L, None, None))
      .toDF("id", "gone", "both")
    val b = Seq((1, Some("n"), Some(2.0)), (2, None, Some(3.0)), (3, None, None))
      .toDF("id", "fresh", "both")
      .withColumn("id", F.col("id").cast("int"))
    val rows = DataAudit.schemaDrift(a, b).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("id").getAs[String]("status") == "type_changed")
    assert(rows("id").getAs[String]("type_a") == "bigint")
    assert(rows("id").getAs[String]("type_b") == "int")
    assert(rows("gone").getAs[String]("status") == "removed")
    assert(rows("fresh").getAs[String]("status") == "added")
    assert(rows("both").getAs[String]("status") == "unchanged")
    assert(rows("both").getAs[Long]("null_a") == 1L)
    assert(rows("both").getAs[Long]("null_b") == 1L)
    assert(rows("both").getAs[Double]("null_rate_a") == 0.5)
    assert(rows("fresh").getAs[Long]("null_b") == 2L)
    assert(rows("fresh").getAs[Long]("null_a") == 0L)
    assert(rows.size == 4)
  }

  test("streamingOrphanCounts transformations: anti-join + day window on a batch frame") {
    import spark.implicits._
    import java.sql.Timestamp
    // day 1: fks {1(ok), 5(orphan), 5(orphan)}; day 2: {7(orphan)}; nulls dropped
    val rows = Seq(
      (Some(1L), Timestamp.valueOf("2024-01-01 10:00:00")),
      (Some(5L), Timestamp.valueOf("2024-01-01 11:00:00")),
      (Some(5L), Timestamp.valueOf("2024-01-01 12:00:00")),
      (Some(7L), Timestamp.valueOf("2024-01-02 09:00:00")),
      (None, Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("fk", "ts")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = DataAudit.streamingOrphanCounts(rows, "fk", "ts", "1 day", parent, "pk")
      .select(F.col("window.start").cast("string").as("w"), F.col("orphan_rows"))
      .collect().map(r => r.getString(0).take(10) -> r.getLong(1)).toMap
    assert(got == Map("2024-01-01" -> 2L, "2024-01-02" -> 1L))
  }

  test("benfordDigits: digit extraction from cents, zero/null/negative excluded") {
    import spark.implicits._
    // 1.23→123 (d1), 0.05→5 (d5), 912.00→91200 (d9), 19.99→1999 (d1),
    // 0.0 and null and -5.0 excluded
    val df = Seq(Some(1.23), Some(0.05), Some(912.00), Some(19.99),
      Some(0.0), None, Some(-5.0)).toDF("v").repartition(3)
    val rows = DataAudit.benfordDigits(df, "v").collect()
      .map(r => r.getAs[Long]("digit") -> r).toMap
    assert(rows.size == 9)
    assert(rows(1L).getAs[Long]("n") == 2L)
    assert(rows(5L).getAs[Long]("n") == 1L)
    assert(rows(9L).getAs[Long]("n") == 1L)
    assert(rows(2L).getAs[Long]("n") == 0L)
    assert(rows(1L).getAs[Double]("obs_p") == 0.5)
    assert(rows(1L).getAs[Double]("benford_p") == 0.301030)
    assert(rows(1L).getAs[Double]("excess") == 0.5 - 0.301030)
    // proportions over PRESENT digits sum to 1
    val tot = rows.values.map(_.getAs[Double]("obs_p")).sum
    assert(math.abs(tot - 1.0) < 1e-12)
  }

  test("lDiversity: histogram of distinct-sensitive counts per qi group") {
    import spark.implicits._
    // group (a,1): users {u1,u2}; (a,2): {u1}; (b,1): {u1,u2,u3}
    val df = Seq(
      ("a", 1, "u1"), ("a", 1, "u2"), ("a", 1, "u1"),
      ("a", 2, "u1"),
      ("b", 1, "u1"), ("b", 1, "u2"), ("b", 1, "u3"))
      .toDF("q1", "q2", "user")
    val got = DataAudit.lDiversity(df, Seq("q1", "q2"), "user")
      .orderBy("l").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("keySkewReport: top-k heavy keys with exact shares; NULL counts as a key") {
    import spark.implicits._
    val df = (Seq.fill(5)(Some("a")) ++ Seq.fill(3)(Some("b")) ++
      Seq(Some("c")) ++ Seq.fill(2)(Option.empty[String]))
      .toDF("k").repartition(3)
    val rows = DataAudit.keySkewReport(df, "k", 3).collect()
    assert(rows.length == 3)
    val top = rows.map(r => (Option(r.getString(0)), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(top(0) == ((Some("a"), 5L, 5.0 / 11.0, 5.0 / 11.0, 11L, 4L)))
    assert(top(1) == ((Some("b"), 3L, 3.0 / 11.0, 8.0 / 11.0, 11L, 4L)))
    assert(top(2) == ((None, 2L, 2.0 / 11.0, 10.0 / 11.0, 11L, 4L)))
  }

  test("keySkewReport: k beyond the key count returns every key; shares sum to 1") {
    import spark.implicits._
    val df = Seq("x", "x", "y", "y").toDF("k")
    val rows = DataAudit.keySkewReport(df, "k", 10).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSeq == Seq("x", "y")) // count tie -> key order
    assert(rows.map(_.getDouble(2)).sum == 1.0)
    assert(rows.last.getDouble(3) == 1.0) // cumulative share closes at 1
  }

  test("rangePartitionPlan: uniform keys split evenly; counts exact; ends open") {
    import spark.implicits._
    val df = (1 to 80).map(_.toLong).toDF("k")
    val rows = DataAudit.rangePartitionPlan(df, "k", 4).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(3)).toSeq == Seq(20L, 20L, 20L, 20L))
    assert(rows.head.isNullAt(1) && rows.last.isNullAt(2))
    assert(rows.map(_.getDouble(4)).sum == 1.0)
  }

  test("rangePartitionPlan: heavy ties surface as empty buckets (the skew signal)") {
    import spark.implicits._
    // 90% of rows share one value: most quantile bounds collapse onto
    // it, leaving empty buckets next to a mega-bucket - exactly what
    // the preflight exists to show
    val df = (Seq.fill(90)(7L) ++ (1 to 10).map(_.toLong + 100L)).toDF("k")
    val rows = DataAudit.rangePartitionPlan(df, "k", 4).collect()
    val counts = rows.map(_.getLong(3))
    assert(counts.sum == 100L)
    assert(counts.max >= 90L, s"mega-bucket expected: ${counts.toSeq}")
    assert(counts.count(_ == 0L) >= 1, s"empty bucket expected: ${counts.toSeq}")
  }

  test("rangePartitionPlan: a value equal to a bound lands in that bound's bucket") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L).toDF("k")
    // p=2: bound = median = 2.5 -> {1,2} left, {3,4} right; with
    // p=4 bounds hit 1.75/2.5/3.25 and each value sits alone
    val rows = DataAudit.rangePartitionPlan(df, "k", 4).collect()
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 1L, 1L, 1L))
    // NULLs excluded
    val withNull = Seq(Some(1L), Some(2L), None, Some(3L), Some(4L)).toDF("k")
    val rows2 = DataAudit.rangePartitionPlan(withNull, "k", 2).collect()
    assert(rows2.map(_.getLong(3)).sum == 4L)
  }

  test("featureCorrelations: hand values, complete-case, canonical pair order") {
    import spark.implicits._
    val df = Seq((1, 2, 5), (2, 4, 4), (3, 6, 3), (4, 8, 1)).toDF("a", "b", "c")
    val got = DataAudit.featureCorrelations(df,
        Seq("a" -> F.col("a"), "b" -> F.col("b"), "c" -> F.col("c")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 3)
    // colinear pair: 1.0 up to the sqrt(X)^2 != X rounding (num = 2X,
    // den = 2*sqrt(X)^2 — exactly 1 only when X is a perfect square)
    assert(got(0)._1 == "a" && got(0)._2 == "b" &&
      math.abs(got(0)._4 - 1.0) < 1e-12)
    val ac = got.find(t => t._1 == "a" && t._2 == "c").get._4
    assert(ac < -0.9 && ac > -1.0) // strongly anti-correlated, not exactly -1
    // NULL in any feature drops the row everywhere
    val withNull = Seq((Some(1), Some(2), Some(5)), (Some(2), None, Some(4)),
      (Some(3), Some(6), Some(3)), (Some(4), Some(8), Some(1))).toDF("a", "b", "c")
    val n = DataAudit.featureCorrelations(withNull,
        Seq("a" -> F.col("a"), "b" -> F.col("b"), "c" -> F.col("c")))
      .collect().head.getLong(2)
    assert(n == 3L)
  }

  test("featureCorrelations: zero-variance feature fails loudly") {
    import spark.implicits._
    val df = Seq((1, 7), (2, 7), (3, 7)).toDF("a", "k")
    val e = intercept[IllegalArgumentException] {
      DataAudit.featureCorrelations(df, Seq("a" -> F.col("a"), "k" -> F.col("k")))
    }
    assert(e.getMessage.contains("zero-variance"))
  }

  test("spearmanCorr: monotone gives ±1 exactly; ties via doubled midranks") {
    import spark.implicits._
    // +-1 up to the sqrt(X)*sqrt(X) != X rounding, as featureCorrelations
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 90.0)).toDF("x", "y")
    assert(math.abs(DataAudit.spearmanCorr(up, "x", "y")
      .collect().head.getDouble(4) - 1.0) < 1e-12)
    val down = Seq((1.0, 9.0), (2.0, 5.0), (3.0, 1.0)).toDF("x", "y")
    assert(math.abs(DataAudit.spearmanCorr(down, "x", "y")
      .collect().head.getDouble(4) + 1.0) < 1e-12)
    // ties: x = [1,1,2] (midranks 1.5,1.5,3), y = [1,2,3] ->
    // d_a = [-1,-1,2], d_b = [-2,0,2]: s_ab=6, s_aa=6, s_bb=8
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    val r = DataAudit.spearmanCorr(tied, "x", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 6L, 6L, 8L)))
    assert(r.getDouble(4) == 6.0 / (math.sqrt(6.0) * math.sqrt(8.0)))
  }

  test("spearmanCorr: complete-case NULL drop; constant side gives NULL rho") {
    import spark.implicits._
    val dirty = Seq((Some(1.0), Some(5.0)), (Some(2.0), None),
      (None, Some(4.0)), (Some(3.0), Some(9.0))).toDF("x", "y")
    val r = DataAudit.spearmanCorr(dirty, "x", "y").collect().head
    assert(r.getLong(0) == 2L && math.abs(r.getDouble(4) - 1.0) < 1e-12)
    val const = Seq((1.0, 7.0), (2.0, 7.0)).toDF("x", "y")
    assert(DataAudit.spearmanCorr(const, "x", "y").collect().head.isNullAt(4))
  }

  test("kendallTau: hand concordance with ties; perfect order; constant side NULL") {
    import spark.implicits._
    // pairs (1,1),(2,2),(2,3),(3,1): cells all count 1
    // unordered cell pairs with both differing: (1,1)-(2,2) C, (1,1)-(2,3) C,
    // (1,1)-(3,... wait (1,1)-(3,1) tied in b; (2,2)-(3,1) D, (2,3)-(3,1) D
    // nc=2 nd=2; ties_a: a=2 twice -> 1; ties_b: b=1 twice -> 1; n0=6
    val d = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 1.0)).toDF("x", "y")
    val r = DataAudit.kendallTau(d, "x", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 2L, 2L, 1L, 1L)))
    assert(r.getDouble(5) == 0.0)
    // perfect monotone, no ties: tau_b = 1 up to the sqrt(X)*sqrt(X) != X
    // rounding (same note as featureCorrelations)
    val up = Seq((1.0, 5.0), (2.0, 6.0), (3.0, 9.0)).toDF("x", "y")
    val ur = DataAudit.kendallTau(up, "x", "y").collect().head
    assert(ur.getLong(1) == 3L && ur.getLong(2) == 0L)
    assert(math.abs(ur.getDouble(5) - 1.0) < 1e-12)
    // constant side: all pairs tied -> NULL
    val const = Seq((1.0, 7.0), (2.0, 7.0)).toDF("x", "y")
    assert(DataAudit.kendallTau(const, "x", "y").collect().head.isNullAt(5))
  }

  test("mutualInformation: zero for exact independence, positive for dependence, NULL drop") {
    import spark.implicits._
    // exactly independent 2x2 (all cells equal): every pmi term is
    // floor(1e6 * ln(1)) = 0, so mi_q is EXACTLY 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "v")
    val ir = DataAudit.mutualInformation(ind, F.col("u"), F.col("v")).collect().head
    assert((ir.getLong(0), ir.getLong(1)) == ((4L, 0L)) && ir.getDouble(2) == 0.0)
    // perfect dependence on 2 symbols: MI = ln 2 nats (quantized)
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("u", "v")
    val dr = DataAudit.mutualInformation(dep, F.col("u"), F.col("v")).collect().head
    assert(dr.getLong(1) == 4L * math.floor(1e6 * math.log(2.0)).toLong)
    assert(math.abs(dr.getDouble(2) - math.log(2.0)) < 1e-5)
    // NULLs are complete-case dropped
    val dirty = Seq((Some("a"), Some("x")), (None, Some("x")),
      (Some("a"), None)).toDF("u", "v")
    assert(DataAudit.mutualInformation(dirty, F.col("u"), F.col("v"))
      .collect().head.getLong(0) == 1L)
  }

  test("kendallTau: partitioning-invariant; agrees in sign with spearman on lineitem") {
    val li = table("lineitem")
    val a = DataAudit.kendallTau(li, "l_quantity", "l_discount").collect().head
    val b = DataAudit.kendallTau(li.repartition(23), "l_quantity", "l_discount")
      .collect().head
    assert(a.toSeq == b.toSeq)
    val rho = DataAudit.spearmanCorr(li, "l_quantity", "l_discount")
      .collect().head.getDouble(4)
    val tau = a.getDouble(5)
    assert(tau == 0.0 || rho == 0.0 || tau.sign == rho.sign)
  }

  test("spearmanCorr: partitioning-invariant on lineitem (exact integer stats)") {
    val li = table("lineitem")
    val a = DataAudit.spearmanCorr(li, "l_quantity", "l_extendedprice")
      .collect().head
    val b = DataAudit.spearmanCorr(li.repartition(19), "l_quantity", "l_extendedprice")
      .collect().head
    assert(a.toSeq == b.toSeq)
    assert(math.abs(a.getDouble(4)) < 1.0 && a.getLong(0) > 0)
  }

  test("cramersV: perfect association gives 1, exact independence gives 0") {
    import spark.implicits._
    // perfect: a == b. chi2 = 5·4/4 + 5·9/9 − 5 = 5; V = √(5/(5·1)) = 1
    val perfect = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val p = DataAudit.cramersV(perfect, F.col("a"), F.col("b")).collect().head
    assert(p.getLong(0) == 5L && p.getLong(1) == 2L && p.getLong(2) == 2L)
    assert(p.getDouble(4) == 5.0 && p.getDouble(5) == 1.0)
    // independence: uniform 2×2, every cell term floor(1e6·1.0) = 1e6 → chi2 = 0
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = DataAudit.cramersV(indep, F.col("a"), F.col("b")).collect().head
    assert(i.getDouble(4) == 0.0 && i.getDouble(5) == 0.0)
  }

  test("cramersV: complete-case NULL drop; constant side gives NULL V; invariance") {
    import spark.implicits._
    val df = Seq((Some("x"), Some("u")), (Some("x"), None), (None, Some("v")),
      (Some("y"), Some("u"))).toDF("a", "b")
    val r = DataAudit.cramersV(df, F.col("a"), F.col("b")).collect().head
    assert(r.getLong(0) == 2L) // only (x,u) and (y,u) survive
    assert(r.isNullAt(5))      // b is constant over the complete cases
    val ord = table("orders")
    val one = DataAudit.cramersV(ord, F.col("o_orderstatus"), F.col("o_orderpriority"))
      .collect().head
    val two = DataAudit.cramersV(ord.repartition(17), F.col("o_orderstatus"),
      F.col("o_orderpriority")).collect().head
    assert(one.toSeq == two.toSeq)
    assert(one.getDouble(5) >= 0.0 && one.getDouble(5) <= 1.0)
  }

  test("keyConcentration: hand Gini/HHI/top-share; uniform keys give Gini 0") {
    import spark.implicits._
    // counts per key: a 1, b 1, c 2 (n_keys 3, N 4, sorted 1,1,2)
    // s1 = 1*1 + 1*2 + 2*3 = 9; gini = (18 - 4*4)/(3*4) = 2/12
    // hhi = (1+1+4)/16; top_share = 2/4
    val df = Seq("a", "b", "c", "c").toDF("k").repartition(3)
    val r = DataAudit.keyConcentration(df, "k").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 6.0 / 16.0)
    assert(r.getDouble(4) == 2.0 / 12.0)
    // perfectly uniform: gini exactly 0, hhi = 1/n_keys
    val u = Seq("a", "b", "c", "d").toDF("k")
    val ru = DataAudit.keyConcentration(u, "k").collect().head
    assert(ru.getDouble(4) == 0.0 && ru.getDouble(3) == 0.25)
    // partitioning invariance on the fixture
    val a1 = DataAudit.keyConcentration(eventsDF, "user_id").collect().head
    val a2 = DataAudit.keyConcentration(eventsDF.repartition(17), "user_id")
      .collect().head
    assert(a1.toSeq == a2.toSeq)
  }

  test("tCloseness: hand TVD, absent-value mass, identical-distribution zero, NULL drop") {
    import spark.implicits._
    // global: x 3, y 1 (N=4). group a = {x,x}: dist (1,0) vs (3/4,1/4)
    //   num = |2*4-3*2| + 2*(4-3) = 2+2 = 4; tvd = 4/(2*2*4) = 0.25
    // group b = {x,y}: |1*4-3*2| + |1*4-1*2| + 0 = 2+2; tvd = 4/16 = 0.25
    val df = Seq(("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"),
      ("b", null.asInstanceOf[String])).toDF("g", "s")
    val got = DataAudit.tCloseness(df, Seq("g"), "s").orderBy("g").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 4L &&
      got(0).getDouble(3) == 0.25)
    assert(got(1).getLong(2) == 4L && got(1).getDouble(3) == 0.25)
    // a group distributed exactly like the global population scores 0
    val same = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("g", "s")
    val z = DataAudit.tCloseness(same, Seq("g"), "s").collect()
    assert(z.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("tCloseness: a NULL quasi-identifier group is reported, not dropped") {
    import spark.implicits._
    // global: x 3, y 1 (N=4). NULL-g group = {x,x}: same hand numbers
    // as group a above -> tvd 0.25; the null-safe marginal join must
    // keep it (a plain equi-join would silently drop the whole group)
    val df = Seq(("a", "x"), ("a", "y"),
      (null.asInstanceOf[String], "x"), (null.asInstanceOf[String], "x"))
      .toDF("g", "s")
    val got = DataAudit.tCloseness(df, Seq("g"), "s")
      .orderBy(F.col("g").asc_nulls_last).collect()
    assert(got.length == 2)
    val nullRow = got(1)
    assert(nullRow.isNullAt(0))
    assert(nullRow.getLong(1) == 2L)
    // {x,x} vs global (3/4, 1/4): num = |2*4-3*2| + 2*(4-3) = 4
    assert(nullRow.getLong(2) == 4L && nullRow.getDouble(3) == 0.25)
    // multi-column QI with one NULL component also survives
    val multi = Seq(("a", "p", "x"), ("a", null.asInstanceOf[String], "x"),
      ("a", null.asInstanceOf[String], "y")).toDF("g1", "g2", "s")
    val m = DataAudit.tCloseness(multi, Seq("g1", "g2"), "s").collect()
    assert(m.length == 2 && m.exists(_.isNullAt(1)))
  }

  test("theilsU: determined-by gives U=1 on that side; independence gives ~0; constant NULL") {
    import spark.implicits._
    // a is a FUNCTION of b (each b value maps to one a), but b is not
    // determined by a: U(a|b) = 1 exactly (H(a|b) = 0 => MI = H(a));
    // U(b|a) = H(a)/H(b) < 1
    val fn = Seq(("x", "u"), ("x", "v"), ("y", "w"), ("y", "w")).toDF("a", "b")
    val r = DataAudit.theilsU(fn, F.col("a"), F.col("b")).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == r.getLong(2))   // mi_q == h_a_q exactly
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) < 1.0 && r.getDouble(5) > 0.0)
    // independence: uniform 2x2 -> every pointwise term ln(1) = 0
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = DataAudit.theilsU(ind, F.col("a"), F.col("b")).collect().head
    assert(i.getLong(1) == 0L && i.getDouble(4) == 0.0 && i.getDouble(5) == 0.0)
    // constant a: zero entropy denominator -> NULL that side
    val const = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val c = DataAudit.theilsU(const, F.col("a"), F.col("b")).collect().head
    assert(c.isNullAt(4) && !c.isNullAt(5))
  }
}
