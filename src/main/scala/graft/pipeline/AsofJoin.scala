package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Point-in-time (as-of) join — for each left row, the single right row
  * with the greatest `rightTs ≤ leftTs` in the same key group. The
  * feature-store staple (training rows joined to the latest feature
  * snapshot known AT event time, never the future — the leakage guard),
  * and one of the canonical operators Spark's join zoo lacks.
  *
  * Spark-first formulation: no custom physical operator needed — union
  * the two sides tagged, hash-partition by key, sort each partition by
  * (ts, side, tie), and carry the latest right payload forward with
  * `last(..., ignoreNulls)`. That is ONE exchange (by key) and a local
  * sort — the same cost envelope as a co-partitioned merge join — and
  * it beats the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax
  * formulation, which materializes every (event, earlier-snapshot) pair
  * (quadratic per key) before discarding all but one.
  *
  * Right rows order BEFORE left rows at equal ts, so a snapshot stamped
  * exactly at event time is visible (the `≤` in the contract). Ties
  * inside the right side (two snapshots at one key+ts) resolve to the
  * larger `tieCol` — "last write wins", deterministic.
  *
  * Skew note: a hot key serializes into one task like any
  * per-key-ordered operator (windows, sessionization); as-of semantics
  * need the key's full timeline, so salting does not apply — if one key
  * dominates the corpus, pre-split it by time range.
  */
object AsofJoin {

  /** Left outer as-of join. `rightPayload` columns are appended to every
    * left row (null where no right row precedes it). Payload names must
    * not collide with left column names (prefix them on the right). */
  def asofLeft(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    require(rightPayload.nonEmpty, "nothing to join: empty rightPayload")
    require(rightPayload.forall(c => !left.columns.contains(c)),
      s"payload collides with left columns: prefix it " +
        s"(${rightPayload.filter(left.columns.contains).mkString(", ")})")
    val reserved = Seq("__ts", "__side", "__tie", "__pay", "__last")
    require((left.columns ++ right.columns).forall(c => !reserved.contains(c)),
      s"inputs must not use the reserved working names ${reserved.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val payType = right.select(
      F.struct(rightPayload.map(F.col): _*).as("__pay")).schema("__pay").dataType
    val l = left
      .withColumn("__ts", F.col(leftTs))
      .withColumn("__side", F.lit(1))
      .withColumn("__tie", F.lit(null).cast("long"))
      .withColumn("__pay", F.lit(null).cast(payType))
    // NULL never equals NULL in a SQL join: a NULL-keyed right row must
    // not become the payload of a NULL-keyed left row just because the
    // window partitioner groups NULLs together — drop such rows up
    // front (left NULL-key rows then see an empty partition → null
    // payload, matching ASOF left-outer semantics).
    val r0 = right
      .filter(keyCols.map(F.col(_).isNotNull).reduce(_ && _))
      .withColumn("__ts", F.col(rightTs))
      .withColumn("__side", F.lit(0))
      .withColumn("__tie", F.col(tieCol).cast("long"))
      .withColumn("__pay", F.struct(rightPayload.map(F.col): _*))
      .select(keyCols.map(F.col) ++
        Seq(F.col("__ts"), F.col("__side"), F.col("__tie"), F.col("__pay")): _*)
    val r = leftCols.filterNot(keyCols.contains).foldLeft(r0) { (acc, c) =>
      acc.withColumn(c, F.lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(F.col): _*)
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col("__ts").asc, F.col("__side").asc, F.col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last", F.last("__pay", ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
      .select(leftCols.map(F.col) ++
        rightPayload.map(c => F.col("__last").getField(c).as(c)): _*)
  }
}
