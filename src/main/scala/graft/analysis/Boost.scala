package graft.analysis

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.{functions => F}

/** BIT-EXACT gradient boosting (least-squares boosting over decision
  * stumps, Friedman 2001 §4.1) — the trainable family's ensemble
  * member. Float GBMs are run-to-run irreproducible at scale (partial
  * float sums); this one trains on INTEGER targets with INTEGER leaf
  * values (floor means), so residuals stay exact integers through
  * every round and the whole training trajectory — splits, leaves,
  * per-round SSE — replays in SQL bit-for-bit, like the BPE / NB /
  * k-means trainers.
  *
  * Round structure: base prediction = floor(mean(y)); each round fits
  * the best regression stump to the current residuals (criterion:
  * maximize `SL²/nL + SR²/nR` — the SSE reduction — computed as
  * single IEEE ops over exact BIGINTs, ties (feature, threshold)
  * low), subtracts the integer leaf values, and records the exact
  * post-round SSE. Learning rate 1 (integer shrinkage would need
  * scaled residuals; at stump capacity the unshrunk fit is the
  * textbook LS-boost step).
  *
  * Exactness bounds (ANSI overflows loudly past them): `SL² < 2⁶³` —
  * |Σ residuals| < 3e9, i.e. any corpus with n·|y| below ~3e9; `SL²`
  * also stays below 2⁵³ for |SL| < 9.4e7 so the double criterion is
  * computed on exactly-represented integers at realistic scales.
  *
  * Scale shape per round: ONE map-side-combined
  * `groupBy(feature, bin)` histogram exchange (sums + counts — the
  * same bounded LightGBM histogram as [[TreeSplit]]), a driver scan of
  * the histogram, a map-only residual update, and one 1-row SSE
  * aggregate; the residual frame is localCheckpointed per round
  * (iterative-lineage truncation). Rows with a NULL split-feature bin
  * route right, as [[TreeSplit.depth2]].
  *
  * (Reference analog: none — whylogs monitors model outputs; this
  * trains the model reproducibly enough to hash its training run.)
  */
object Boost {

  /** Train `rounds` stumps on integer-valued `yCol`. Output one row per
    * round, ordered: round 0 is the base prediction
    * `(0, '__base', NULL, m0, m0, n, 0, sse0)`; round t ≥ 1 is
    * `(t, feature, threshold, left_val, right_val, n_left, n_right,
    * sse_t)` with sse the EXACT integer Σresidual² after applying the
    * round. */
  /** The trained ensemble in driver form: base prediction + per-round
    * stumps `(feature, threshold, left_val, right_val)`. */
  final case class BoostModel(base: Long,
      stumps: Seq[(String, Long, Long, Long)])

  /** INFERENCE: the ensemble prediction as a map-only column —
    * `base + Σ stump leaf` with the same ≤/route-right-on-NULL rule as
    * training. Stateless, so it scores a stream at ingestion. */
  def predictColumn(model: BoostModel,
      features: Seq[TreeSplit.FeatureSpec]): org.apache.spark.sql.Column = {
    val byName = features.map(f => f.name -> f.bin).toMap
    model.stumps.foldLeft(F.lit(model.base)) { case (acc, (feat, thr, lv, rv)) =>
      val bin = byName.getOrElse(feat,
        throw new IllegalArgumentException(s"model references unknown feature $feat"))
      acc + F.when(bin.cast("long") <= thr, lv).otherwise(rv)
    }
  }

  /** Train and return the driver-held model (the trace-free form of
    * [[lsBoost]] — same run, same rounds). */
  def lsBoostModel(df: DataFrame, yCol: String,
      features: Seq[TreeSplit.FeatureSpec], rounds: Int): BoostModel = {
    val trace = lsBoost(df, yCol, features, rounds).collect()
    BoostModel(trace.head.getLong(3),
      trace.drop(1).map(r =>
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
  }

  def lsBoost(df: DataFrame, yCol: String,
      features: Seq[TreeSplit.FeatureSpec], rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(features.nonEmpty, "need at least one feature")
    val spark = df.sparkSession
    import spark.implicits._
    val featCols = features.map(f => f.bin.cast("long").as("__fb_" + f.name))
    var cur = df.select(featCols :+ F.col(yCol).cast("long").as("__r"): _*)
      .localCheckpoint(false)
    // round 0: integer base prediction
    val base = cur.agg(F.sum("__r").as("s"), F.count(F.lit(1)).as("n")).head
    val (s0, n0) = (base.getLong(0), base.getLong(1))
    require(n0 > 0, "empty training frame")
    val m0 = math.floor(s0.toDouble / n0.toDouble).toLong
    cur = cur.withColumn("__r", F.col("__r") - F.lit(m0)).localCheckpoint(false)
    val sse0 = cur.agg(F.sum(F.col("__r") * F.col("__r"))).head.getLong(0)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Option[Long], Long, Long, Long, Long, Long)]
    out += ((0L, "__base", None, m0, m0, n0, 0L, sse0))
    val fs = F.explode(F.array(features.map(f =>
      F.struct(F.lit(f.name).as("f"), F.col("__fb_" + f.name).as("b"))): _*)).as("fs")
    var t = 1
    var done = false
    while (t <= rounds && !done) {
      val hist = cur.select(fs, F.col("__r"))
        .select(F.col("fs.f").as("f"), F.col("fs.b").as("b"), F.col("__r"))
        .filter(F.col("b").isNotNull)
        .groupBy("f", "b").agg(F.sum("__r").as("s"), F.count(F.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // driver scan: best (score DESC, feature, threshold) split
      var best: Option[(Double, String, Long, Long, Long, Long, Long)] = None
      hist.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (feat, rows) =>
        val bins = rows.sortBy(_._2)
        val sTot = bins.map(_._3).sum
        val nTot = bins.map(_._4).sum
        var sl = 0L; var nl = 0L
        bins.dropRight(1).foreach { case (_, thr, bs, bn) =>
          sl += bs; nl += bn
          val sr = sTot - sl; val nr = nTot - nl
          val score = (sl.toDouble * sl.toDouble) / nl.toDouble +
            (sr.toDouble * sr.toDouble) / nr.toDouble
          val cand = (score, feat, thr, sl, nl, sr, nr)
          val better = best match {
            case None => true
            case Some(b) =>
              score > b._1 || (score == b._1 && (feat < b._2 ||
                (feat == b._2 && thr < b._3)))
          }
          if (better) best = Some(cand)
        }
      }
      best match {
        case None => done = true // every feature single-binned: nothing to fit
        case Some((_, feat, thr, sl, nl, sr, nr)) =>
          val lv = math.floor(sl.toDouble / nl.toDouble).toLong
          val rv = math.floor(sr.toDouble / nr.toDouble).toLong
          cur = cur.withColumn("__r", F.col("__r") -
              F.when(F.col("__fb_" + feat) <= thr, lv).otherwise(rv))
            .localCheckpoint(false)
          val sse = cur.agg(F.sum(F.col("__r") * F.col("__r"))).head.getLong(0)
          out += ((t.toLong, feat, Some(thr), lv, rv, nl, nr, sse))
          t += 1
      }
    }
    out.toSeq.toDF("round", "feature", "threshold", "left_val", "right_val",
      "n_left", "n_right", "sse")
      .orderBy("round")
  }
}
