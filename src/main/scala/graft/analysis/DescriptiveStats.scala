package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions._

/** Exact descriptive statistics via decimal accumulation.
  *
  * Complements the sketch-based DistributionMetric: sums are accumulated in
  * decimal, which is associative and exact, so results are bit-identical
  * regardless of partitioning — the property the reference gets from
  * single-threaded execution and we must preserve under distribution
  * (reference semantics: whylogs `core/metrics/metrics.py:321-359`).
  *
  * Variance uses the textbook sum-of-squares identity evaluated in double
  * from the two exact decimal sums, so it is deterministic as well.
  */
object DescriptiveStats {

  /** One row with `<col>__{n,nulls,min,max,sum,mean,var,stddev}` per column.
    * Inputs are assumed to carry a bounded number of decimal digits (money
    * columns); `scale` controls the decimal cast.
    */
  def aggColumns(cols: Seq[String], scale: Int = 6): Seq[Column] =
    cols.flatMap { c0 =>
      val c = F.col(c0)
      val present = F.count(F.when(c.isNotNull && !F.isnan(c), 1))
      val sumd = exact_sum(c, scale)
      val sumsq = exact_sum_sq(c)
      val meanExpr = sumd / present
      val varExpr = (sumsq - (sumd * sumd) / present) / (present - 1)
      Seq(
        present.as(s"${c0}__n"),
        count_where(c.isNull).as(s"${c0}__nulls"),
        F.min(c).as(s"${c0}__min"),
        F.max(c).as(s"${c0}__max"),
        sumd.as(s"${c0}__sum"),
        meanExpr.as(s"${c0}__mean"),
        varExpr.as(s"${c0}__var"),
        F.sqrt(varExpr).as(s"${c0}__stddev"))
    }

  def df(data: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame = {
    val aggs = aggColumns(cols, scale)
    data.agg(aggs.head, aggs.tail: _*)
  }

  /** The equivalent ANSI SQL (DuckDB dialect) for [[aggColumns]] over
    * `table` — same expression tree so double arithmetic is bit-identical. */
  def oracleSql(table: String, cols: Seq[String], scale: Int = 6): String = {
    val parts = cols.flatMap { c =>
      val p = s"count(*) FILTER (WHERE $c IS NOT NULL AND NOT isnan($c))"
      val sumd = s"CAST(sum(CAST($c AS DECIMAL(${27 + scale},$scale))) AS DOUBLE)"
      // DECIMAL(19,·) operands force DuckDB onto the INT128 multiply path;
      // width-18 operands multiply in int64 and overflow. Values are exact
      // decimals either way, so Spark (18,4) and DuckDB (19,4) agree bitwise.
      val sumsq = s"CAST(sum(CAST(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS DOUBLE)"
      val mean = s"$sumd / $p"
      val vr = s"($sumsq - ($sumd * $sumd) / $p) / ($p - 1)"
      Seq(
        s"$p AS ${c}__n",
        s"count(*) FILTER (WHERE $c IS NULL) AS ${c}__nulls",
        s"min($c) AS ${c}__min",
        s"max($c) AS ${c}__max",
        s"$sumd AS ${c}__sum",
        s"$mean AS ${c}__mean",
        s"$vr AS ${c}__var",
        s"sqrt($vr) AS ${c}__stddev")
    }
    s"SELECT ${parts.mkString(", ")} FROM $table"
  }
}
