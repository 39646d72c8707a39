package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Exact decision-stump split finding — the trainable family's tree
  * member, in the histogram shape every scale GBDT uses (LightGBM /
  * XGBoost-hist): ONE map-side-combined `groupBy(feature, bin, label)`
  * over the corpus builds the bounded split histogram, and the split
  * scan runs over that histogram, never the rows. Supervised split
  * quality for data curation: "which single quality-feature threshold
  * best separates kept from dropped documents" is a stump question.
  *
  * Exactness: all counts are BIGINTs; the split criterion is kept as
  * an exact integer FRACTION and one final IEEE divide —
  * `impurity = num / den` with
  * `num = (nL² − ΣcL²)·nR + (nR² − ΣcR²)·nL`, `den = nL·nR`
  * (= n × the weighted mean Gini impurity of the split, a monotone
  * transform of the usual criterion for fixed n). No float
  * accumulation anywhere, so candidate ranking replays in SQL
  * bit-for-bit. Integer range: `nL²·nR ≤ n³` must stay below 2⁶³ —
  * exact up to ~2M rows per stump, and the bound fails LOUDLY on both
  * halves: the distributed counts are ANSI BIGINTs, and the
  * driver-side criterion is computed with `Math.multiplyExact` /
  * `addExact` (plain JVM Long math would wrap silently and rank
  * splits wrong with no error). At larger n, pre-bin with
  * [[graft.analysis.ExactQuantiles]] sketch-free quantile bins and
  * subsample per the usual GBDT recipe.
  *
  * Scale shape: one exchange (the histogram groupBy — hot bins
  * collapse map-side), a driver-side scan of the bounded histogram
  * (features × bins × classes rows — the LightGBM contract that bins
  * are bounded, NOT the corpus), no windows, no joins.
  *
  * (Reference analog: none in whylogs — it profiles model OUTPUTS;
  * this trains the model whose outputs [[ModelPerf]] then monitors.)
  */
object TreeSplit {

  /** A candidate feature: `bin` must be an integer-valued (castable to
    * long) binned expression — raw integer columns, cents-scaled
    * decimals, or quantile-bin ids. NULL bins/labels are excluded. */
  final case class FeatureSpec(name: String, bin: Column)

  /** The distributed half: the `(feature, bin, label) → count` split
    * histogram — ONE map-side-combined exchange, no joins, the scan
    * pruned to the feature/label columns. Its size is bounded by
    * features × bins × classes (the LightGBM contract), which is what
    * makes the driver-side split scan legitimate at any corpus size. */
  def histogram(df: DataFrame, labelCol: String,
      features: Seq[FeatureSpec]): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val fs = F.explode(F.array(features.map(f =>
      F.struct(F.lit(f.name).as("f"), f.bin.cast("long").as("b"))): _*)).as("fs")
    df.select(fs, F.col(labelCol).cast("string").as("__l"))
      .select(F.col("fs.f").as("__f"), F.col("fs.b").as("__b"), F.col("__l"))
      .filter(F.col("__b").isNotNull && F.col("__l").isNotNull)
      .groupBy("__f", "__b", "__l").agg(F.count(F.lit(1)).as("__c"))
  }

  /** Node-tagged histogram: the same single exchange builds EVERY
    * tree-level node's histogram at once (`groupBy(node, feature, bin,
    * label)`) — how a level-wise tree grows one level per pass. */
  private def histogramBy(df: DataFrame, labelCol: String,
      features: Seq[FeatureSpec], nodeCol: Column): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val fs = F.explode(F.array(features.map(f =>
      F.struct(F.lit(f.name).as("f"), f.bin.cast("long").as("b"))): _*)).as("fs")
    df.select(nodeCol.as("__node"), fs, F.col(labelCol).cast("string").as("__l"))
      .select(F.col("__node"), F.col("fs.f").as("__f"), F.col("fs.b").as("__b"),
        F.col("__l"))
      .filter(F.col("__b").isNotNull && F.col("__l").isNotNull)
      .groupBy("__node", "__f", "__b", "__l").agg(F.count(F.lit(1)).as("__c"))
  }

  /** Driver-side candidate scan over a collected histogram slice. */
  private def scanCandidates(
      hist: Seq[(String, Long, String, Long)])
      : Seq[(String, Long, Long, Long, Long, Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Long, Double)]
    hist.groupBy(_._1).foreach { case (feat, rows) =>
      val labels = rows.map(_._3).distinct.sorted
      val bins = rows.map(_._2).distinct.sorted
      val counts = rows.map(r => (r._2, r._3) -> r._4).toMap
      val total = labels.map(l => l -> rows.filter(_._3 == l).map(_._4).sum).toMap
      val n = total.valuesIterator.sum
      val cl = scala.collection.mutable.Map(labels.map(_ -> 0L): _*)
      bins.foreach { thr =>
        labels.foreach(l => cl(l) += counts.getOrElse((thr, l), 0L))
        val nL = cl.valuesIterator.sum
        val nR = n - nL
        if (nL > 0 && nR > 0) {
          // multiplyExact/addExact, NOT plain Long math: past the
          // documented nL²·nR < 2⁶³ bound plain arithmetic wraps
          // SILENTLY and ranks splits wrong with no error — the
          // exactness contract must fail loudly, exactly as the
          // ANSI-mode BIGINTs on the distributed side do
          val sl2 = labels.foldLeft(0L)((a, l) =>
            Math.addExact(a, Math.multiplyExact(cl(l), cl(l))))
          val sr2 = labels.foldLeft(0L) { (a, l) =>
            val r = total(l) - cl(l); Math.addExact(a, Math.multiplyExact(r, r))
          }
          val num = Math.addExact(
            Math.multiplyExact(Math.subtractExact(Math.multiplyExact(nL, nL), sl2), nR),
            Math.multiplyExact(Math.subtractExact(Math.multiplyExact(nR, nR), sr2), nL))
          val den = Math.multiplyExact(nL, nR)
          out += ((feat, thr, nL, nR, num, den, num.toDouble / den.toDouble))
        }
      }
    }
    out.toSeq.sortBy(t => (t._7, t._1, t._2))
  }

  /** All candidate splits `(feature, threshold, n_left, n_right, num,
    * den, impurity)` — left = rows with bin ≤ threshold; only splits
    * with both sides non-empty. Ordered best-first
    * (impurity, feature, threshold). */
  def stumpCandidates(df: DataFrame, labelCol: String,
      features: Seq[FeatureSpec]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    scanCandidates(collectHistogram(histogram(df, labelCol, features)))
      .toDF("feature", "threshold", "n_left", "n_right", "num", "den", "impurity")
  }

  private def collectHistogram(h: DataFrame): Seq[(String, Long, String, Long)] =
    h.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq

  /** DEPTH-2 tree: the root split, then the best split of each child —
    * the standard level-wise step. ONE extra exchange grows the whole
    * level: child membership is a map-side `when(rootBin ≤ thr)` tag
    * and BOTH child histograms build in the same
    * `groupBy(node, feature, bin, label)` pass (never one pass per
    * node — at depth d that discipline keeps the scan count at d, not
    * 2^d). Rows with a NULL root-feature bin route right, mirroring
    * `CASE WHEN b <= thr … ELSE 'right' END`. Output: one row per node
    * (`'root' | 'left' | 'right'`) with that node's best split,
    * ordered by node; a pure or single-bin child contributes no row. */
  def depth2(df: DataFrame, labelCol: String,
      features: Seq[FeatureSpec]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val root = scanCandidates(collectHistogram(histogram(df, labelCol, features)))
    require(root.nonEmpty, "no valid root split (single bin or empty input)")
    val rb = root.head
    val rootBin = features.find(_.name == rb._1).get.bin.cast("long")
    val node = F.when(rootBin <= rb._2, "left").otherwise("right")
    val childHist = histogramBy(df, labelCol, features, node)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val children = childHist.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (nd, rows) =>
        scanCandidates(rows.map(r => (r._2, r._3, r._4, r._5)).toSeq)
          .headOption
          .map(t => (nd, t._1, t._2, t._3, t._4, t._5, t._6, t._7))
    }
    (children :+ (("root", rb._1, rb._2, rb._3, rb._4, rb._5, rb._6, rb._7)))
      .sortBy(_._1)
      .toDF("node", "feature", "threshold", "n_left", "n_right", "num", "den",
        "impurity")
  }

  /** A trained classification stump: the global best split plus the
    * MAJORITY class of each side (count ties to the smallest label). */
  final case class StumpModel(feature: String, threshold: Long,
      leftClass: String, rightClass: String)

  /** Train a classification stump: global best (impurity, feature,
    * threshold) split, per-side majority classes read off the same
    * collected histogram — no extra pass. */
  def stumpModel(df: DataFrame, labelCol: String,
      features: Seq[FeatureSpec]): StumpModel = {
    val hist = collectHistogram(histogram(df, labelCol, features))
    val cands = scanCandidates(hist)
    require(cands.nonEmpty, "no valid split (single bin or empty input)")
    val (feat, thr) = (cands.head._1, cands.head._2)
    val rows = hist.filter(_._1 == feat)
    def majority(side: Seq[(String, Long, String, Long)]): String =
      side.groupBy(_._3).view.mapValues(_.map(_._4).sum).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
    StumpModel(feat, thr,
      majority(rows.filter(_._2 <= thr)), majority(rows.filter(_._2 > thr)))
  }

  /** INFERENCE: the stump's predicted class as a map-only column
    * (NULL bins route right, as training/depth2). Stateless — scores a
    * stream at ingestion. */
  def stumpPredictColumn(model: StumpModel,
      features: Seq[FeatureSpec]): Column = {
    val bin = features.find(_.name == model.feature).getOrElse(
      throw new IllegalArgumentException(
        s"model references unknown feature ${model.feature}")).bin
    F.when(bin.cast("long") <= model.threshold, model.leftClass)
      .otherwise(model.rightClass)
  }

  /** The best split per feature (lowest impurity, threshold ties low). */
  def stumpBest(df: DataFrame, labelCol: String,
      features: Seq[FeatureSpec]): DataFrame = {
    val c = stumpCandidates(df, labelCol, features)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("feature")
      .orderBy(F.col("impurity"), F.col("threshold"))
    c.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1).drop("__rn")
      .orderBy("feature")
  }
}
