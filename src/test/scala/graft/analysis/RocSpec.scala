package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class RocSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Boolean)]) = rows.toDF("s", "y")

  test("rocAuc: hand case with ties — exact Mann-Whitney fraction") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // pairs: (3,2)=1 (3,1)=1 (2,2)=0.5 (2,1)=1 -> AUC = 3.5/4
    val d = frame(Seq((3L, true), (2L, true), (2L, false), (1L, false)))
    val r = Roc.rocAuc(d, F.col("s"), F.col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 7L, 8L)))
    assert(r.getDouble(4) == 7.0 / 8.0)
  }

  test("rocAuc: perfect and inverted separation; absent class gives NULL") {
    val perfect = frame(Seq((9L, true), (8L, true), (1L, false)))
    assert(Roc.rocAuc(perfect, F.col("s"), F.col("y"))
      .collect().head.getDouble(4) == 1.0)
    val inverted = frame(Seq((1L, true), (9L, false)))
    assert(Roc.rocAuc(inverted, F.col("s"), F.col("y"))
      .collect().head.getDouble(4) == 0.0)
    val onlyPos = frame(Seq((1L, true), (2L, true)))
    assert(Roc.rocAuc(onlyPos, F.col("s"), F.col("y")).collect().head.isNullAt(4))
  }

  test("rocCurve: operating points walk threshold DESC with exact counts") {
    val d = frame(Seq((3L, true), (2L, true), (2L, false), (1L, false)))
    val got = Roc.rocCurve(d, F.col("s"), F.col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (3L, 1L, 0L, 0.5, 0.0, 1.0),
      (2L, 2L, 1L, 1.0, 0.5, 2.0 / 3.0),
      (1L, 2L, 2L, 1.0, 1.0, 0.5)))
  }

  test("rocAuc: partitioning-invariant (exact integer statistic)") {
    val li = table("lineitem")
    val score = F.round(F.col("l_discount") * 100)
    val label = F.col("l_returnflag") === "R"
    val a = Roc.rocAuc(li, score, label).collect().toSeq
    val b = Roc.rocAuc(li.repartition(17), score, label).collect().toSeq
    assert(a == b)
    val auc = a.head.getDouble(4)
    assert(auc > 0.0 && auc < 1.0)
  }

  test("rocAucBy: per-segment AUC equals rocAuc on each slice; inversion surfaces") {
    import org.apache.spark.sql.Row
    // segment A ranks perfectly, segment B is inverted — global AUC
    // would average the failure away
    val d = Seq(("A", 9L, true), ("A", 1L, false),
      ("B", 1L, true), ("B", 9L, false)).toDF("g", "s", "y")
    val got = Roc.rocAucBy(d, F.col("g"), F.col("s"), F.col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(got == Map("A" -> 1.0, "B" -> 0.0))
    // slice parity on real data
    val li = table("lineitem")
    val score = F.round(F.col("l_discount") * 100)
    val label = F.col("l_returnflag") === "R"
    val by = Roc.rocAucBy(li, F.col("l_linestatus"), score, label)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((seg, stats) <- by) {
      val solo = Roc.rocAuc(li.filter(F.col("l_linestatus") === seg), score, label)
        .collect().head
      assert(stats == ((solo.getLong(0), solo.getLong(1), solo.getLong(2),
        solo.getLong(3))), s"segment $seg diverged")
    }
    assert(by.nonEmpty)
  }

  test("rocAuc: NULL scores and labels are excluded") {
    val d = Seq((Some(3L), Some(true)), (Some(2L), Some(false)),
      (None, Some(true)), (Some(5L), None)).toDF("s", "y")
    val r = Roc.rocAuc(d, F.col("s"), F.col("y")).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 1L)))
    assert(r.getDouble(4) == 1.0)
  }

  test("agreementMetrics: hand kappa/MCC; perfect and degenerate cases") {
    // confusion [[2,1],[1,2]]: n=6, diag=4, t=p=(3,3):
    // num = 6*4 - 18 = 6, kappa = 6/18 = 1/3, mcc = 6/(sqrt18*sqrt18)
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "a"),
      ("b", "b"), ("b", "b")).toDF("l", "p")
    val r = ModelPerf.agreementMetrics(d, F.col("l"), F.col("p")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 4L, 6L)))
    assert(r.getDouble(3) == 6.0 / 18.0)
    assert(math.abs(r.getDouble(4) - 1.0 / 3.0) < 1e-12)
    // perfect agreement
    val perfect = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"),
      ("b", "b")).toDF("l", "p")
    val pr = ModelPerf.agreementMetrics(perfect, F.col("l"), F.col("p"))
      .collect().head
    assert(pr.getDouble(3) == 1.0 && math.abs(pr.getDouble(4) - 1.0) < 1e-12)
    // single class on both sides: chance correction degenerates -> NULL
    val one = Seq(("a", "a"), ("a", "a")).toDF("l", "p")
    val or = ModelPerf.agreementMetrics(one, F.col("l"), F.col("p"))
      .collect().head
    assert(or.isNullAt(3) && or.isNullAt(4))
  }

  test("spearmanMatrix: pair values equal pairwise spearmanCorr; one shared sample") {
    import graft.analysis.DataAudit
    val li = table("lineitem")
    val cols = Seq("l_quantity", "l_discount", "l_tax")
    val m = DataAudit.spearmanMatrix(li, cols).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m.size == 3)
    for (Seq(a, b) <- cols.combinations(2)) {
      val solo = DataAudit.spearmanCorr(li, a, b).collect().head
      val key = if (a <= b) (a, b) else (b, a)
      assert(m(key) == ((solo.getLong(0), solo.getDouble(4))), s"pair $key diverged")
    }
  }
}
