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

  /** Every counter named in `types` is zero (reference
    * `factories/types_metrics.py:24-39`; the reference names the
    * constraint by the complement set — we name by the checked set,
    * sorted, since Python set iteration order is not reproducible). */
  def columnHasZeroCountTypes(c: String, types: Seq[String]): Constraint =
    Constraint(s"column_has_zero_count_types($c,${types.sorted.mkString("+")})", Some(c),
      v => col(v, c).types.exists { t =>
        val counters = Map(
          "boolean" -> t.boolean, "fractional" -> t.fractional,
          "integral" -> t.integral, "object" -> t.obj,
          "string" -> t.string, "tensor" -> t.tensor)
        types.forall(k => counters.get(k).forall(_ == 0L))
      })

  // ---- condition factories (`factories/condition_counts.py:4-49`) ----
  // In graft, condition counts are computed beside the profile
  // (Conditions.countsDF) rather than stored inside it, so these
  // constraints evaluate against an explicitly supplied counts view —
  // documented divergence; the profile-view parameter is unused.

  /** All values matched the condition (`condition_counts.py:4-26`). */
  def conditionMeets(c: String, cond: String,
      cc: ConstraintSuggestions.ConditionCountsView): Constraint =
    Constraint(s"condition_meets($c,$cond)", Some(c),
      _ => cc.matches.get(cond).contains(cc.total))

  /** No value matched the condition (`condition_counts.py:28-49`). */
  def conditionNeverMeets(c: String, cond: String,
      cc: ConstraintSuggestions.ConditionCountsView): Constraint =
    Constraint(s"condition_never_meets($c,$cond)", Some(c),
      _ => cc.matches.get(cond).contains(0L))

  // ---- dataset-level constraints (`metric_constraints.py:246-300`) ----

  def datasetRowCountAtLeast(n: Long): Constraint =
    Constraint(s"dataset_row_count_at_least($n)", None, v =>
      v.columns.values.flatMap(_.counts).map(_.n).maxOption.exists(_ >= n))

  def datasetHasColumns(cols: Set[String]): Constraint =
    Constraint(s"dataset_has_columns(${cols.toSeq.sorted.mkString("+")})", None,
      v => cols.subsetOf(v.columns.keySet))
}

/** Target-vs-reference constraints over two profiles — the reference's
  * DatasetComparisonConstraint (`metric_constraints.py:203-244`). Both
  * sides are KB-scale collected profiles; evaluation is driver-side. */
final case class ComparisonConstraint(
    name: String, check: (DatasetProfileView, DatasetProfileView) => Boolean)

final class ComparisonConstraints(val constraints: Seq[ComparisonConstraint]) {
  def report(target: DatasetProfileView, ref: DatasetProfileView): Seq[ConstraintReport] =
    constraints.map { c =>
      val passed = try c.check(target, ref)
        catch { case _: NoSuchElementException => false }
      ConstraintReport(c.name, None, passed)
    }
}

object ComparisonConstraints {
  def apply(cs: ComparisonConstraint*): ComparisonConstraints = new ComparisonConstraints(cs)

  private def counts(v: DatasetProfileView, c: String) =
    v.columns(c).counts.getOrElse(throw new NoSuchElementException(c))
  private def dist(v: DatasetProfileView, c: String) =
    v.columns(c).distribution.getOrElse(throw new NoSuchElementException(c))

  /** Same column names on both sides. */
  def schemaMatches: ComparisonConstraint =
    ComparisonConstraint("schema_matches",
      (t, r) => t.columns.keySet == r.columns.keySet)

  /** |n_t − n_r| ≤ pct · n_r. */
  def rowCountWithinPct(c: String, pct: Double): ComparisonConstraint =
    ComparisonConstraint(s"row_count_within_pct($c,$pct)", (t, r) => {
      val nt = counts(t, c).n; val nr = counts(r, c).n
      nr > 0 && math.abs(nt - nr) <= pct * nr
    })

  def nullCountsEqual(c: String): ComparisonConstraint =
    ComparisonConstraint(s"null_counts_equal($c)",
      (t, r) => counts(t, c).nulls == counts(r, c).nulls)

  def minsEqual(c: String): ComparisonConstraint =
    ComparisonConstraint(s"mins_equal($c)",
      (t, r) => dist(t, c).min == dist(r, c).min)

  def maxNotExceedsReference(c: String): ComparisonConstraint =
    ComparisonConstraint(s"max_not_exceeds_reference($c)", (t, r) =>
      (for (mt <- dist(t, c).max; mr <- dist(r, c).max) yield mt <= mr).getOrElse(false))

  /** Rounded HLL estimates agree (exact for coupon-range cardinalities). */
  def distinctCountsMatch(c: String): ComparisonConstraint =
    ComparisonConstraint(s"distinct_counts_match($c)", (t, r) =>
      (for (ct <- t.columns(c).cardinality; cr <- r.columns(c).cardinality)
        yield math.round(ct.estimate) == math.round(cr.estimate)).getOrElse(false))

  /** Relative mean drift bound: |mean_t − mean_r| ≤ tol · max(1, |mean_r|). */
  def meanWithinRelativeTolerance(c: String, tol: Double): ComparisonConstraint =
    ComparisonConstraint(s"mean_within_relative_tolerance($c,$tol)", (t, r) => {
      val dt = dist(t, c); val dr = dist(r, c)
      dt.n > 0 && dr.n > 0 &&
        math.abs(dt.mean - dr.mean) <= tol * math.max(1.0, math.abs(dr.mean))
    })
}
