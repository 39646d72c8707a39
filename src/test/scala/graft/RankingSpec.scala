package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.Ranking

/** Ranking metrics vs the reference's own docstring fixtures
  * (`experimental/api/logger/__init__.py:215-276`) and hand-computed
  * expectations for every input mode. */
class RankingSpec extends SparkSpec {

  private val eps = 1e-9
  private def near(a: Double, b: Double) = math.abs(a - b) < eps

  test("numeric rank mode: the reference's first docstring example") {
    import spark.implicits._
    // targets [1,0,1], predicted ranks [2,3,1], k=3
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(2L, 3L, 1L))).toDF("targets", "predictions")
    val out = Ranking.logBatchRankingMetrics(df,
      predictionCol = Some("predictions"), targetCol = Some("targets"),
      k = Some(3)).head
    assert(near(out.getAs[Double]("recall_k_3"), 1.0))
    assert(near(out.getAs[Double]("precision_k_3"), 2.0 / 3))
    assert(out.getAs[Long]("top_rank") == 1L)
    assert(near(out.getAs[Double]("average_precision_k_3"), 1.0))
    assert(near(out.getAs[Double]("norm_dis_cumul_gain_k_3"), 1.0))
    assert(near(out.getAs[Double]("sum_gain_k_3"), 2.0))
    assert(near(out.getAs[Double]("reciprocal_rank"), 1.0))
  }

  test("string mode: the reference's non-numeric docstring example, k=2") {
    import spark.implicits._
    val df = Seq(
      (Seq("cat", "pig", "elephant"), Seq("cat", "elephant")),
      (Seq("horse", "donkey", "robin"), Seq("dog"))).toDF("preds", "tgts")
    val rows = Ranking.logBatchRankingMetrics(df,
      predictionCol = Some("preds"), targetCol = Some("tgts"), k = Some(2))
      .collect()
    val r1 = rows(0)
    assert(near(r1.getAs[Double]("recall_k_2"), 0.5))
    assert(near(r1.getAs[Double]("precision_k_2"), 0.5))
    assert(r1.getAs[Long]("top_rank") == 1L)
    assert(near(r1.getAs[Double]("average_precision_k_2"), 1.0))
    // dcg = 1/log2(2); idcg = 1/log2(2) + 1/log2(3)
    assert(near(r1.getAs[Double]("norm_dis_cumul_gain_k_2"),
      1.0 / (1.0 + 0.6309297535714575)))
    assert(near(r1.getAs[Double]("sum_gain_k_2"), 1.0))
    val r2 = rows(1)
    assert(r2.isNullAt(r2.fieldIndex("recall_k_2")), "0/0 recall is null")
    assert(near(r2.getAs[Double]("precision_k_2"), 0.0))
    assert(r2.isNullAt(r2.fieldIndex("top_rank")))
    assert(near(r2.getAs[Double]("average_precision_k_2"), 0.0))
    // ideal relevance [1,0,0,0] (dog uncovered) → idcg=1, dcg=0
    assert(near(r2.getAs[Double]("norm_dis_cumul_gain_k_2"), 0.0))
    assert(near(r2.getAs[Double]("reciprocal_rank"), 0.0))
  }

  test("target-only mode: the reference's binary docstring example, k=3") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Seq(true, false, true)),
      Tuple1(Seq(false, false, false)),
      Tuple1(Seq(true, true, false))).toDF("raw_targets")
    val rows = Ranking.logBatchRankingMetrics(df,
      targetCol = Some("raw_targets"), k = Some(3)).collect()
    val r1 = rows(0)
    assert(near(r1.getAs[Double]("recall_k_3"), 1.0))
    assert(near(r1.getAs[Double]("precision_k_3"), 2.0 / 3))
    assert(near(r1.getAs[Double]("average_precision_k_3"), (1.0 + 2.0 / 3) / 2))
    assert(near(r1.getAs[Double]("norm_dis_cumul_gain_k_3"),
      1.5 / 1.6309297535714575))
    assert(near(r1.getAs[Double]("sum_gain_k_3"), 2.0))
    val r2 = rows(1)
    assert(r2.isNullAt(r2.fieldIndex("recall_k_3")))
    // no relevant data at all → reference returns NDCG 1
    assert(near(r2.getAs[Double]("norm_dis_cumul_gain_k_3"), 1.0))
    assert(near(r2.getAs[Double]("reciprocal_rank"), 0.0))
    val r3 = rows(2)
    assert(near(r3.getAs[Double]("average_precision_k_3"), 1.0))
    assert(near(r3.getAs[Double]("norm_dis_cumul_gain_k_3"), 1.0))
    assert(r3.getAs[Long]("top_rank") == 1L)
  }

  test("score mode: stable tie-break matches argsort(argsort(-score))+1") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0, 1.0, 1.0), Seq(0.5, 0.7, 0.5, 0.2)))
      .toDF("tgts", "scores")
    // ranks must be [2,1,3,4]: the two 0.5s break by list position
    val ranks = df.select(Ranking.ranksFromScores(F.col("scores")).as("r"))
      .head.getSeq[Long](0)
    assert(ranks == Seq(2L, 1L, 3L, 4L))
    val out = Ranking.logBatchRankingMetrics(df,
      targetCol = Some("tgts"), scoreCol = Some("scores"), k = Some(2)).head
    assert(near(out.getAs[Double]("recall_k_2"), 1.0 / 3))
    assert(near(out.getAs[Double]("precision_k_2"), 0.5))
    assert(out.getAs[Long]("top_rank") == 2L)
    assert(near(out.getAs[Double]("reciprocal_rank"), 0.5))
    assert(near(out.getAs[Double]("average_precision_k_2"), 0.5))
    assert(near(out.getAs[Double]("norm_dis_cumul_gain_k_2"),
      0.6309297535714575 / 1.6309297535714575))
    assert(near(out.getAs[Double]("sum_gain_k_2"), 1.0))
  }

  test("k clamps to the longest prediction list; dispatch guards") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(true, false, true))).toDF("t")
    val out = Ranking.logBatchRankingMetrics(df, targetCol = Some("t"),
      k = Some(99))
    assert(out.columns.contains("recall_k_3"), out.columns.mkString(","))
    val both = Seq((Seq(1.0), Seq(1L), Seq(0.5))).toDF("t", "p", "s")
    intercept[IllegalArgumentException] {
      Ranking.logBatchRankingMetrics(both, predictionCol = Some("p"),
        targetCol = Some("t"), scoreCol = Some("s"))
    }
    intercept[IllegalArgumentException] {
      Ranking.logBatchRankingMetrics(both)
    }
  }

  test("numeric-vs-string-mode cross-check on an equivalent random corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    // items "i0".."i9" ranked randomly; relevant set random — encode the
    // SAME rows numerically (pred[i] = rank of item i, target[i] = 1 if
    // item i relevant) and as strings; every metric must agree
    val rows = Seq.fill(80) {
      val perm = rng.shuffle((0 until 10).toList)
      val relevant = (0 until 10).filter(_ => rng.nextBoolean())
      (perm, relevant)
    }
    val strDf = rows.map { case (perm, rel) =>
      // perm(r) = item at rank r+1
      (perm.map(i => s"i$i"), rel.map(i => s"i$i"))
    }.toDF("p", "t")
    val numDf = rows.map { case (perm, rel) =>
      // invert: rank of item i
      val rank = Array.ofDim[Long](10)
      perm.zipWithIndex.foreach { case (item, pos) => rank(item) = pos + 1L }
      (rank.toSeq, (0 until 10).map(i => if (rel.contains(i)) 1.0 else 0.0))
    }.toDF("p", "t")
    val k = 4
    val s = Ranking.logBatchRankingMetrics(strDf,
      predictionCol = Some("p"), targetCol = Some("t"), k = Some(k)).collect()
    val n = Ranking.logBatchRankingMetrics(numDf,
      predictionCol = Some("p"), targetCol = Some("t"), k = Some(k)).collect()
    s.zip(n).zipWithIndex.foreach { case ((a, b), i) =>
      for (c <- Seq(s"recall_k_$k", s"precision_k_$k",
          s"average_precision_k_$k", s"sum_gain_k_$k", "reciprocal_rank")) {
        val av = Option(a.getAs[java.lang.Double](c)).map(_.doubleValue)
        val bv = Option(b.getAs[java.lang.Double](c)).map(_.doubleValue)
        assert((av, bv) match {
          case (Some(x), Some(y)) => near(x, y)
          case (None, None) => true
          case _ => false
        }, s"row $i col $c: $av vs $bv")
      }
      // NDCG differs by design: string mode uses position-based discount
      // with uncovered-target padding; numeric uses graded relevance.
      // Binary relevance + full coverage make them equal ONLY when every
      // relevant item is covered by the prediction list — true here
      // (pred is a full permutation), so compare those too
      assert(near(a.getAs[Double](s"norm_dis_cumul_gain_k_$k"),
        b.getAs[Double](s"norm_dis_cumul_gain_k_$k")), s"row $i ndcg")
    }
  }

  test("edges: empty lists, k=1, and non-permutation duplicate ranks") {
    import spark.implicits._
    // empty row: no relevant data → reference semantics give NDCG 1,
    // zero precision/AP/RR, null recall and top_rank
    val empty = Ranking.logBatchRankingMetrics(
      Seq((Seq.empty[Double], Seq.empty[Long]), (Seq(1.0), Seq(1L)))
        .toDF("t", "p"),
      predictionCol = Some("p"), targetCol = Some("t"), k = Some(1),
      clampK = false).collect()
    val e = empty(0)
    assert(e.isNullAt(e.fieldIndex("recall_k_1")))
    assert(e.isNullAt(e.fieldIndex("top_rank")))
    assert(near(e.getAs[Double]("precision_k_1"), 0.0))
    assert(near(e.getAs[Double]("average_precision_k_1"), 0.0))
    assert(near(e.getAs[Double]("norm_dis_cumul_gain_k_1"), 1.0))
    assert(near(e.getAs[Double]("reciprocal_rank"), 0.0))
    val one = empty(1)
    assert(near(one.getAs[Double]("recall_k_1"), 1.0))
    assert(near(one.getAs[Double]("precision_k_1"), 1.0))
    assert(one.getAs[Long]("top_rank") == 1L)
    // duplicate ranks (not a 1..n permutation): the documented contract
    // is "rank value <= k", so BOTH rank-1 elements count toward k=1
    val dup = Ranking.logBatchRankingMetrics(
      Seq((Seq(1.0, 1.0, 0.0), Seq(1L, 1L, 2L))).toDF("t", "p"),
      predictionCol = Some("p"), targetCol = Some("t"), k = Some(1),
      clampK = false).head
    assert(near(dup.getAs[Double]("precision_k_1"), 2.0))
    assert(dup.getAs[Long]("top_rank") == 1L)
  }

  test("property: random graded corpora match a direct port of the reference row functions") {
    import spark.implicits._
    // faithful port of RowWiseMetrics / _calculate_average_precisions
    // (reference __init__.py:20-131, numeric branch)
    def ref(pred: Seq[Long], tgt: Seq[Double], k: Int)
        : (Long, Long, Option[Long], Option[Double], Double, Double, Double, Double, Double) = {
      val pairs = pred.zip(tgt).sorted // python sorted(zip(pred, target))
      def relevantCounter(kk: Int) = pairs.take(kk).count(_._2 != 0.0).toLong
      def isK(kk: Int): Int = {
        // the reference's list.index(k) assumes rank k exists (uniform
        // row lengths — it raises otherwise); absent rank = not relevant
        val idx = pred.indexOf(kk.toLong)
        if (idx >= 0 && tgt(idx) != 0.0) 1 else 0
      }
      def log2(x: Double) = math.log(x) / math.log(2.0)
      val maxK = pred.length
      val countAtK = relevantCounter(k)
      val countAll = relevantCounter(maxK)
      val topRank = (1 to maxK).find(isK(_) == 1).map(_.toLong)
      val recall =
        if (countAll == 0) None else Some(countAtK.toDouble / countAll)
      val precision = countAtK.toDouble / k
      val aps = (1 to k).map(ki => (relevantCounter(ki).toDouble / ki) * isK(ki))
      val ap = aps.sum / math.max(aps.count(_ != 0.0), 1)
      val dcg = tgt.zip(pred).collect {
        case (t, p) if p <= k => t / log2(p + 1.0)
      }.sum
      val idcg = tgt.sorted.reverse.take(k).zipWithIndex.map {
        case (t, i) => t / log2(i + 2.0)
      }.sum
      val ndcg = if (idcg == 0.0) 1.0 else dcg / idcg
      val sumGain = pairs.take(k).map(_._2).sum
      val rr = topRank.map(1.0 / _).getOrElse(0.0)
      (countAtK, countAll, topRank, recall, precision, ap, ndcg, sumGain, rr)
    }
    val rng = new scala.util.Random(91)
    val k = 3
    val rows = Seq.fill(120) {
      val n = 1 + rng.nextInt(12)
      val pred = rng.shuffle((1L to n).toList)
      val tgt = Seq.fill(n)(Seq(0.0, 0.0, 0.5, 1.0, 2.0)(rng.nextInt(5)))
      (pred, tgt)
    }
    val out = Ranking.logBatchRankingMetrics(
      rows.toDF("p", "t"), predictionCol = Some("p"), targetCol = Some("t"),
      k = Some(k), clampK = false).collect()
    rows.zip(out).zipWithIndex.foreach { case (((pred, tgt), row), i) =>
      val (_, _, topRank, recall, precision, ap, ndcg, sumGain, rr) =
        ref(pred, tgt, k)
      assert(Option(row.getAs[java.lang.Long]("top_rank"))
        .map(_.longValue) == topRank, s"row $i top_rank")
      val gotRecall = Option(row.getAs[java.lang.Double](s"recall_k_$k"))
        .map(_.doubleValue)
      assert((gotRecall, recall) match {
        case (Some(x), Some(y)) => near(x, y)
        case (None, None) => true
        case _ => false
      }, s"row $i recall")
      assert(near(row.getAs[Double](s"precision_k_$k"), precision), s"row $i precision")
      assert(near(row.getAs[Double](s"average_precision_k_$k"), ap), s"row $i ap")
      assert(near(row.getAs[Double](s"norm_dis_cumul_gain_k_$k"), ndcg), s"row $i ndcg")
      assert(near(row.getAs[Double](s"sum_gain_k_$k"), sumGain), s"row $i sum_gain")
      assert(near(row.getAs[Double]("reciprocal_rank"), rr), s"row $i rr")
    }
  }

  test("NaN scores rank last, matching argsort(-score) with NaN at the end") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 1.0, 0.0), Seq(0.5, Double.NaN, 0.9)))
      .toDF("tgts", "scores")
    // -NaN = NaN sorts to the end of np.argsort ascending → worst rank
    val ranks = df.select(Ranking.ranksFromScores(F.col("scores")).as("r"))
      .head.getSeq[Long](0)
    assert(ranks == Seq(2L, 3L, 1L))
    val out = Ranking.logBatchRankingMetrics(df,
      targetCol = Some("tgts"), scoreCol = Some("scores"), k = Some(2)).head
    assert(out.getAs[Long]("top_rank") == 2L)
    assert(near(out.getAs[Double]("recall_k_2"), 0.5))
    // two NaNs keep their relative list positions (stable within the group)
    val two = Seq(Tuple1(Seq(Double.NaN, 0.3, Double.NaN))).toDF("s")
      .select(Ranking.ranksFromScores(F.col("s"))).head.getSeq[Long](0)
    assert(two == Seq(2L, 1L, 3L))
  }

  test("clampK=false with k beyond the longest list is honored, not clamped") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(2L, 1L))).toDF("t", "p")
    val out = Ranking.logBatchRankingMetrics(df,
      predictionCol = Some("p"), targetCol = Some("t"), k = Some(5),
      clampK = false).head
    // one relevant element at rank 2 of 2; denominators use the RAW k=5
    assert(near(out.getAs[Double]("recall_k_5"), 1.0))
    assert(near(out.getAs[Double]("precision_k_5"), 1.0 / 5))
    assert(out.getAs[Long]("top_rank") == 2L)
    // clampK=true (default) would have pinned the same frame to k=2
    val clamped = Ranking.logBatchRankingMetrics(df,
      predictionCol = Some("p"), targetCol = Some("t"), k = Some(5))
    assert(clamped.columns.contains("recall_k_2"))
  }

  test("misuse fails loudly: empty frame, mixed types, reserved columns") {
    import spark.implicits._
    val empty = Seq.empty[(Seq[Double], Seq[Long])].toDF("t", "p")
    val e1 = intercept[IllegalArgumentException] {
      Ranking.logBatchRankingMetrics(empty,
        predictionCol = Some("p"), targetCol = Some("t"), k = Some(2))
    }
    assert(e1.getMessage.contains("non-null list"), e1.getMessage)
    val mixed = Seq((Seq("a", "b"), Seq(1L, 0L))).toDF("p", "t")
    val e2 = intercept[IllegalArgumentException] {
      Ranking.logBatchRankingMetrics(mixed,
        predictionCol = Some("p"), targetCol = Some("t"), k = Some(1))
    }
    assert(e2.getMessage.contains("mixed ranking input types"), e2.getMessage)
    val strScore = Seq((Seq("a"), Seq(1.0))).toDF("t", "s")
    val e3 = intercept[IllegalArgumentException] {
      Ranking.logBatchRankingMetrics(strScore,
        targetCol = Some("t"), scoreCol = Some("s"), k = Some(1))
    }
    assert(e3.getMessage.contains("score mode"), e3.getMessage)
    val clash = Seq((Seq(1.0), Seq(1L), 9L)).toDF("t", "p", "top_rank")
    val e4 = intercept[IllegalArgumentException] {
      Ranking.logBatchRankingMetrics(clash,
        predictionCol = Some("p"), targetCol = Some("t"), k = Some(1))
    }
    assert(e4.getMessage.contains("collide"), e4.getMessage)
  }
}
