package graft.analysis

import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.memory.Memory

import graft.profile.{ColumnProfileView, DatasetProfileView}

/** Constraint generation from a reference profile — the reference's
  * `generate_constraints_from_reference_profile` family (whylogs
  * `experimental/constraints_generation/__init__.py:25-79` plus the six
  * per-metric generator modules in the same package).
  *
  * Generation is pure driver-side logic over an already-collected
  * KB-scale profile view: profiling 100 TB once yields the view; turning
  * the view into a constraint suite costs nothing more.
  *
  * Each suggestion is produced as a structured [[SuggestedConstraint]]
  * (column, kind, numeric/set parameters) so callers can inspect or
  * persist the suite; [[SuggestedConstraint.toConstraint]] materializes
  * the runnable [[Constraint]] via the standard factories.
  */
object ConstraintSuggestions {

  /** Reference `CardinalityThresholds` (`core/metrics/metrics.py:669-671`). */
  val FewThreshold: Double = 50.0
  val ProportionatelyFew: Double = 0.01

  /** Reference `is_probably_unique` (`core/utils/stats_calculations.py:25-31`):
    * the non-null count falls inside the HLL ±`hllStdDev`σ bounds. Bounds
    * are recomputed from the sketch image at 3σ (the generator's default),
    * not the 1σ pair carried in the summary. */
  def isProbablyUnique(cp: ColumnProfileView, hllStdDev: Int = 3): Boolean =
    (for (card <- cp.cardinality; cnt <- cp.counts) yield {
      val sk = HllSketch.heapify(Memory.wrap(card.hll))
      val nonNull = (cnt.n - cnt.nulls).toDouble
      sk.getLowerBound(hllStdDev) <= nonNull && nonNull <= sk.getUpperBound(hllStdDev)
    }).getOrElse(false)

  /** Reference `only_null_values` (`stats_calculations.py:56-62`). */
  def onlyNullValues(cp: ColumnProfileView): Boolean =
    cp.counts.exists(c => c.n == c.nulls)

  /** Reference `get_cardinality_estimate` (`stats_calculations.py:39-54`):
    * (est, est / non-null count). */
  def cardinalityEstimate(cp: ColumnProfileView): (Option[Double], Option[Double]) = {
    val est = cp.cardinality.map(_.estimate)
    val pct = for {
      e <- est
      cnt <- cp.counts
      nonNull = cnt.n - cnt.nulls
      if nonNull != 0
    } yield e / nonNull
    (est, pct)
  }

  /** Per-column condition-count totals. In graft, condition counts are
    * computed beside the profile (Conditions.countsDF) rather than inside
    * it, so generation and evaluation both take this view explicitly —
    * documented divergence from the reference, where `condition_count`
    * is a column metric. */
  final case class ConditionCountsView(matches: Map[String, Long], total: Long)

  /** One generated constraint, structured: `kind` is the factory name,
    * `lo`/`hi` its numeric bounds (is_in_range), `types` the
    * zero-count type list, `refSet` the frequent-strings reference set
    * (sorted for determinism — the reference embeds a Python set repr in
    * the constraint name, which has no stable order). */
  final case class SuggestedConstraint(
      column: String,
      kind: String,
      lo: Option[Double] = None,
      hi: Option[Double] = None,
      types: Seq[String] = Nil,
      refSet: Seq[String] = Nil,
      condition: Option[String] = None) {

    def toConstraint(conditionCounts: Map[String, ConditionCountsView] = Map.empty): Constraint =
      kind match {
        case "column_is_probably_unique" => Constraints.columnIsProbablyUnique(column)
        case "no_missing_values"         => Constraints.noMissingValues(column)
        case "column_has_zero_count_types" =>
          Constraints.columnHasZeroCountTypes(column, types)
        case "is_non_negative" => Constraints.isNonNegative(column)
        case "is_in_range"     => Constraints.isInRange(column, lo.get, hi.get)
        case "frequent_strings_in_reference_set" =>
          Constraints.frequentStringsInReferenceSet(column, refSet.toSet)
        case "condition_meets" =>
          Constraints.conditionMeets(column, condition.get,
            conditionCounts.getOrElse(column, ConditionCountsView(Map.empty, 0L)))
        case "condition_never_meets" =>
          Constraints.conditionNeverMeets(column, condition.get,
            conditionCounts.getOrElse(column, ConditionCountsView(Map.empty, 0L)))
        case other => throw new IllegalArgumentException(s"unknown suggestion kind: $other")
      }
  }

  /** Generate a constraint suite from a reference profile view
    * (reference `__init__.py:25-79`). Columns are visited in sorted-name
    * order; within a column the generator order is the reference's:
    * multi-metrics, counts, types, condition counts, distribution,
    * frequent items. */
  def suggest(
      view: DatasetProfileView,
      includedColumns: Option[Seq[String]] = None,
      excludedColumns: Option[Seq[String]] = None,
      conditionCounts: Map[String, ConditionCountsView] = Map.empty): Seq[SuggestedConstraint] = {
    require(includedColumns.isEmpty || excludedColumns.isEmpty,
      "Only one of includedColumns or excludedColumns can be specified.")
    val cols = view.columns.toSeq.sortBy(_._1)
      .filter { case (name, _) => includedColumns.forall(_.contains(name)) }
      .filter { case (name, _) => excludedColumns.forall(!_.contains(name)) }
    cols.flatMap { case (name, cp) => suggestColumn(name, cp, conditionCounts.get(name)) }
  }

  private def suggestColumn(
      name: String,
      cp: ColumnProfileView,
      condCounts: Option[ConditionCountsView]): Seq[SuggestedConstraint] = {
    val out = Seq.newBuilder[SuggestedConstraint]
    val probablyUnique = isProbablyUnique(cp)
    val (est, uniquePct) = cardinalityEstimate(cp)

    // multi_metrics.py:10-16
    if (probablyUnique && !onlyNullValues(cp))
      out += SuggestedConstraint(name, "column_is_probably_unique")

    // count_metrics.py:8-22
    cp.counts.foreach { c =>
      if (c.nulls == 0) out += SuggestedConstraint(name, "no_missing_values")
    }

    // types_metrics.py:8-26: every type counter that is zero
    cp.types.foreach { t =>
      val zero = Seq(
        "boolean" -> t.boolean, "fractional" -> t.fractional,
        "integral" -> t.integral, "object" -> t.obj,
        "string" -> t.string, "tensor" -> t.tensor)
        .collect { case (k, 0L) => k }
      if (zero.nonEmpty)
        out += SuggestedConstraint(name, "column_has_zero_count_types", types = zero)
    }

    // condition_counts.py:8-26
    condCounts.foreach { cc =>
      cc.matches.toSeq.sortBy(_._1).foreach { case (cond, matches) =>
        if (matches == cc.total)
          out += SuggestedConstraint(name, "condition_meets", condition = Some(cond))
        if (matches == 0L)
          out += SuggestedConstraint(name, "condition_never_meets", condition = Some(cond))
      }
    }

    // distribution_metrics.py:16-41
    cp.distribution.foreach { d =>
      if (d.min.exists(_ >= 0))
        out += SuggestedConstraint(name, "is_non_negative")
      if (!probablyUnique && est.exists(_ > FewThreshold)) {
        for {
          lo <- d.min if !lo.isNaN
          hi <- d.max if !hi.isNaN
        } out += SuggestedConstraint(name, "is_in_range", lo = Some(lo), hi = Some(hi))
      }
    }

    // frequent_items.py:11-22
    cp.frequentItems.foreach { f =>
      val qualifies = est.exists(e => e > 0 && e <= FewThreshold) &&
        uniquePct.exists(_ < ProportionatelyFew)
      if (qualifies)
        out += SuggestedConstraint(name, "frequent_strings_in_reference_set",
          refSet = f.items.map(_.value).distinct.sorted)
    }
    out.result()
  }
}
