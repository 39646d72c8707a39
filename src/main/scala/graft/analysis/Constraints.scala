package graft.analysis

import graft.profile.{ColumnProfileView, DatasetProfileView}

/** Metric constraints: named predicates over a collected profile view —
  * the reference's MetricConstraint / Constraints machinery
  * (whylogs `python/whylogs/core/constraints/metric_constraints.py:72-713`)
  * with the prebuilt factories of `core/constraints/factories/...`.
  *
  * Constraints run driver-side over the KB-scale profile — they never touch
  * the data again, so validating 100 TB costs one profile pass.
  */
final case class Constraint(name: String, column: Option[String], check: DatasetProfileView => Boolean)

final case class ConstraintReport(name: String, column: Option[String], passed: Boolean)

final class Constraints(val constraints: Seq[Constraint]) {
  def validate(view: DatasetProfileView): Boolean = constraints.forall(_.check(view))
  def report(view: DatasetProfileView): Seq[ConstraintReport] =
    constraints.map(c => ConstraintReport(c.name, c.column, c.passed(view)))

  private implicit class RichConstraint(c: Constraint) {
    def passed(v: DatasetProfileView): Boolean =
      try c.check(v) catch { case _: NoSuchElementException => false }
  }
}

object Constraints {
  def apply(cs: Constraint*): Constraints = new Constraints(cs)

  private def col(v: DatasetProfileView, name: String): ColumnProfileView =
    v.columns.getOrElse(name, throw new NoSuchElementException(name))

  // ---- count-metric factories (`factories/count_metrics.py:8-90`) ----
  def noMissingValues(c: String): Constraint =
    Constraint(s"no_missing_values($c)", Some(c), v => col(v, c).counts.exists(_.nulls == 0))

  def nullValuesBelowNumber(c: String, n: Long): Constraint =
    Constraint(s"null_values_below_number($c,$n)", Some(c),
      v => col(v, c).counts.exists(_.nulls < n))

  def nullPercentageBelowNumber(c: String, pct: Double): Constraint =
    Constraint(s"null_percentage_below_number($c,$pct)", Some(c),
      v => col(v, c).counts.exists(s => s.n > 0 && s.nulls.toDouble / s.n < pct))

  def countBelowNumber(c: String, n: Long): Constraint =
    Constraint(s"count_below_number($c,$n)", Some(c), v => col(v, c).counts.exists(_.n < n))

  // ---- distribution factories (`factories/distribution_metrics.py:7-180`) ----
  def greaterThanNumber(c: String, x: Double): Constraint =
    Constraint(s"greater_than_number($c,$x)", Some(c),
      v => col(v, c).distribution.exists(_.min.exists(_ > x)))

  def smallerThanNumber(c: String, x: Double): Constraint =
    Constraint(s"smaller_than_number($c,$x)", Some(c),
      v => col(v, c).distribution.exists(_.max.exists(_ < x)))

  def isNonNegative(c: String): Constraint =
    Constraint(s"is_non_negative($c)", Some(c),
      v => col(v, c).distribution.exists(_.min.exists(_ >= 0)))

  def isInRange(c: String, lo: Double, hi: Double): Constraint =
    Constraint(s"is_in_range($c,$lo,$hi)", Some(c),
      v => col(v, c).distribution.exists(d => d.min.exists(_ >= lo) && d.max.exists(_ <= hi)))

  def meanBetweenRange(c: String, lo: Double, hi: Double): Constraint =
    Constraint(s"mean_between_range($c,$lo,$hi)", Some(c),
      v => col(v, c).distribution.exists(d => d.n > 0 && d.mean >= lo && d.mean <= hi))

  def stddevBetweenRange(c: String, lo: Double, hi: Double): Constraint =
    Constraint(s"stddev_between_range($c,$lo,$hi)", Some(c),
      v => col(v, c).distribution.exists(d => d.stddev >= lo && d.stddev <= hi))

  def quantileBetweenRange(c: String, rank: Double, lo: Double, hi: Double): Constraint =
    Constraint(s"quantile_between_range($c,$rank,$lo,$hi)", Some(c), v =>
      col(v, c).distribution.exists { d =>
        val i = d.quantileRanks.indexOf(rank)
        i >= 0 && i < d.quantiles.length && d.quantiles(i) >= lo && d.quantiles(i) <= hi
      })

  // ---- cardinality factories (`factories/cardinality_metrics.py:8`) ----
  def distinctNumberInRange(c: String, lo: Double, hi: Double): Constraint =
    Constraint(s"distinct_number_in_range($c,$lo,$hi)", Some(c),
      v => col(v, c).cardinality.exists(s => s.estimate >= lo && s.estimate <= hi))

  /** HLL upper bound ≈ row count ⇒ probably unique
    * (`factories/multi_metrics.py:9`). */
  def columnIsProbablyUnique(c: String): Constraint =
    Constraint(s"column_is_probably_unique($c)", Some(c), v => {
      val cp = col(v, c)
      (for (card <- cp.cardinality; cnt <- cp.counts) yield {
        val nonNull = cnt.n - cnt.nulls
        card.lower <= nonNull && nonNull <= card.upper
      }).getOrElse(false)
    })

  // ---- frequent-items factories (`factories/frequent_items.py:6-50`) ----
  def frequentStringsInReferenceSet(c: String, ref: Set[String]): Constraint =
    Constraint(s"frequent_strings_in_reference_set($c)", Some(c),
      v => col(v, c).frequentItems.exists(f =>
        f.items.nonEmpty && f.items.forall(i => ref.contains(i.value))))

  def nMostCommonItemsInSet(c: String, n: Int, ref: Set[String]): Constraint =
    Constraint(s"n_most_common_items_in_set($c,$n)", Some(c),
      v => col(v, c).frequentItems.exists(f =>
        f.items.take(n).forall(i => ref.contains(i.value))))

  // ---- type factories (`factories/types_metrics.py:8-70`) ----
  def columnIsNullableIntegral(c: String): Constraint =
    Constraint(s"column_is_nullable_integral($c)", Some(c),
      v => col(v, c).types.exists(t =>
        t.integral > 0 && t.fractional == 0 && t.string == 0 && t.boolean == 0))

  def columnIsNullableFractional(c: String): Constraint =
    Constraint(s"column_is_nullable_fractional($c)", Some(c),
      v => col(v, c).types.exists(t =>
        t.fractional > 0 && t.integral == 0 && t.string == 0 && t.boolean == 0))

  def columnIsNullableString(c: String): Constraint =
    Constraint(s"column_is_nullable_string($c)", Some(c),
      v => col(v, c).types.exists(t =>
        t.string > 0 && t.integral == 0 && t.fractional == 0 && t.boolean == 0))

  def columnHasNonZeroTypes(c: String): Constraint =
    Constraint(s"column_has_non_zero_types($c)", Some(c),
      v => col(v, c).types.exists(t =>
        t.integral + t.fractional + t.string + t.boolean + t.obj + t.tensor > 0))

  // ---- condition factories (`factories/condition_counts.py:4-75`) are
  // served by Conditions.countsDF (they predicate on the counted result).
}
