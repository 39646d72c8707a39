package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.{Constraints, ConstraintSuggestions}
import graft.analysis.ConstraintSuggestions.{ConditionCountsView, SuggestedConstraint}
import graft.api.Profiler

/** Constraint generation from a reference profile (reference
  * `experimental/constraints_generation`): gates, suggestion contents,
  * and that every generated constraint passes against its own source
  * profile. */
class ConstraintSuggestionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    // id: unique ints; cat: 3 values; neg: has a negative; nully: all null
    (1L, "a", -5.0), (2L, "b", 1.0), (3L, "a", 2.0), (4L, "c", 3.0),
    (5L, "b", 4.0), (6L, "a", 5.0), (7L, "c", 6.0), (8L, "b", 7.0))
    .toDF("id", "cat", "neg")
    .withColumn("nully", F.lit(null).cast("double"))

  private lazy val view = new Profiler().profile(df)
  private lazy val suggestions = ConstraintSuggestions.suggest(view)

  private def kindsFor(c: String): Seq[String] =
    suggestions.filter(_.column == c).map(_.kind)

  test("unique non-null int column: probably-unique + no-missing + zero-types + non-negative") {
    assert(kindsFor("id") === Seq("column_is_probably_unique", "no_missing_values",
      "column_has_zero_count_types", "is_non_negative"))
    val zt = suggestions.find(s => s.column == "id" && s.kind == "column_has_zero_count_types").get
    assert(zt.types === Seq("boolean", "fractional", "object", "string", "tensor"))
  }

  test("low-cardinality string column generates no FI constraint above proportionately_few") {
    // cat: est 3, unique_pct 3/8 = 0.375 > 0.01 -> FI gate closed
    assert(kindsFor("cat") === Seq("no_missing_values", "column_has_zero_count_types"))
  }

  test("negative column does not generate is_non_negative") {
    assert(!kindsFor("neg").contains("is_non_negative"))
  }

  test("all-null column: no probably-unique (only_null gate), no no-missing") {
    val kinds = kindsFor("nully")
    assert(!kinds.contains("column_is_probably_unique"))
    assert(!kinds.contains("no_missing_values"))
    // all six type counters are zero
    val zt = suggestions.find(s => s.column == "nully" && s.kind == "column_has_zero_count_types").get
    assert(zt.types === Seq("boolean", "fractional", "integral", "object", "string", "tensor"))
  }

  test("is_in_range fires only when est > few and not probably unique") {
    // 60 distinct values, each duplicated -> est 60 > 50, not unique
    val many = (1 to 60).flatMap(i => Seq(i, i)).toDF("v")
    val v = new Profiler().profile(many)
    val s = ConstraintSuggestions.suggest(v)
    val range = s.find(x => x.column == "v" && x.kind == "is_in_range")
    assert(range.exists(r => r.lo.contains(1.0) && r.hi.contains(60.0)))
    assert(!s.exists(x => x.column == "v" && x.kind == "column_is_probably_unique"))
  }

  test("frequent-items constraint fires below both cardinality gates") {
    // 3 distinct over 400 rows: est 3 <= 50, unique_pct 0.0075 < 0.01
    val cats = (1 to 400).map(i => Seq("x", "y", "z")(i % 3)).toDF("c")
    val v = new Profiler().profile(cats)
    val fi = ConstraintSuggestions.suggest(v)
      .find(s => s.column == "c" && s.kind == "frequent_strings_in_reference_set")
    assert(fi.exists(_.refSet === Seq("x", "y", "z")))
  }

  test("condition-count generation: meets on full match, never-meets on zero match") {
    val cc = Map("col" -> ConditionCountsView(Map("all" -> 10L, "none" -> 0L, "some" -> 4L), 10L))
    val sugg = ConstraintSuggestions.suggest(
      new Profiler().profile(Seq(1).toDF("col")), conditionCounts = cc)
      .filter(_.condition.isDefined)
    assert(sugg.map(s => (s.kind, s.condition.get)).toSet ===
      Set(("condition_meets", "all"), ("condition_never_meets", "none")))
    // materialized constraints evaluate against the supplied counts view
    sugg.foreach(s => assert(s.toConstraint(cc).check(view)))
    assert(!Constraints.conditionMeets("col", "some", cc("col")).check(view))
  }

  test("every generated constraint passes against its own source profile") {
    suggestions.foreach { s =>
      assert(s.toConstraint().check(view), s"${s.column}/${s.kind} should pass")
    }
  }

  test("included/excluded column filters are exclusive and applied") {
    assert(ConstraintSuggestions.suggest(view, includedColumns = Some(Seq("id")))
      .forall(_.column == "id"))
    assert(ConstraintSuggestions.suggest(view, excludedColumns = Some(Seq("id")))
      .forall(_.column != "id"))
    intercept[IllegalArgumentException] {
      ConstraintSuggestions.suggest(view, Some(Seq("id")), Some(Seq("cat")))
    }
  }

  test("suggestion kinds materialize to the matching factories") {
    val byKind = Map(
      SuggestedConstraint("id", "column_is_probably_unique") ->
        "column_is_probably_unique(id)",
      SuggestedConstraint("id", "no_missing_values") -> "no_missing_values(id)",
      SuggestedConstraint("id", "is_non_negative") -> "is_non_negative(id)",
      SuggestedConstraint("id", "is_in_range", lo = Some(1.0), hi = Some(8.0)) ->
        "is_in_range(id,1.0,8.0)",
      SuggestedConstraint("cat", "frequent_strings_in_reference_set",
        refSet = Seq("a", "b", "c")) -> "frequent_strings_in_reference_set(cat)",
      SuggestedConstraint("id", "column_has_zero_count_types",
        types = Seq("string", "boolean")) ->
        "column_has_zero_count_types(id,boolean+string)")
    byKind.foreach { case (s, name) => assert(s.toConstraint().name === name) }
  }
}
