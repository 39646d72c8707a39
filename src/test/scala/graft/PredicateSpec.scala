package graft

import org.apache.spark.sql.{functions => F}

import graft.analysis.{Condition, Conditions, Predicates}

/** Predicate DSL parser/serializer + VarOpt sampling. */
class PredicateSpec extends SparkSpec {

  test("parse/serialize are inverse; ops compile correctly") {
    val exprs = Seq(
      "and >= x 1000 <= x 1500",
      "or == x \"A\" == x \"B\"",
      "not < x 25",
      "~ x [0-9]+",
      "~= x [1-5]-\\w+",
      "% x red",
      "!= x 3.5")
    exprs.foreach { e =>
      val p = Predicates.parse(e)
      assert(Predicates.parse(p.serialize).serialize == p.serialize, e)
    }
    // quoted-string escapes survive
    val q = Predicates.parse("== x \"a\\\"b\"")
    assert(Predicates.parse(q.serialize) == q)
    // value ending in a backslash round-trips (escaped-backslash-before-
    // closing-quote tokenizer regression)
    val bs = Predicates.Rel("==", "x", Predicates.StrValue("a\\"))
    assert(Predicates.parse(bs.serialize) == bs)
  }

  test("validate with no conditions returns empty") {
    assert(Conditions.validate(table("orders"), Seq.empty, "o_orderkey").isEmpty)
  }

  test("metric references parse, serialize, and bind against a profile") {
    import graft.profile._
    // parse/serialize inverse, incl. escaped colon + current-column form
    Seq(">= x :l_quantity:distribution/mean",
        "< x ::counts/n",
        "== x :a\\:b:counts/null").foreach { e =>
      val p = Predicates.parse(e)
      assert(Predicates.parse(p.serialize).serialize == p.serialize, e)
    }
    assert(Predicates.parse("== x :a\\:b:counts/n") ==
      Predicates.Rel("==", "x", Predicates.MetricRef(Some("a:b"), "counts/n")))
    // column names may contain spaces (reference token regex allows them)
    assert(Predicates.parse(">= x :my col:counts/n") ==
      Predicates.Rel(">=", "x", Predicates.MetricRef(Some("my col"), "counts/n")))

    val view = DatasetProfileView(Map(
      "q" -> ColumnProfileView(
        counts = Some(CountsSummary(10, 2, 0, 0, 0)),
        distribution = Some(DistributionSummary(8, 25.5, 0.0, Some(1.0), Some(50.0),
          Seq.empty, Seq.empty, Array.emptyByteArray)))))
    val bound = Predicates.parse(">= x :q:distribution/mean").bindRefs(view)
    assert(bound == Predicates.Rel(">=", "x", Predicates.NumValue(25.5)))
    // ::path binds against the current column
    val cur = Predicates.parse("< x ::counts/null").bindRefs(view, Some("q"))
    assert(cur == Predicates.Rel("<", "x", Predicates.IntValue(2)))
    // unbound refs refuse to compile; missing components fail loudly
    intercept[IllegalStateException](
      Predicates.parse("< x ::counts/n").toColumn(_ => F.lit(1)))
    intercept[IllegalArgumentException](
      Predicates.parse("< x :q:cardinality/est").bindRefs(view))
  }

  test("profile-bound predicate filters rows like the equivalent literal") {
    val li = table("lineitem")
    val prof = new graft.api.Profiler().profile(li, Some(Seq("l_quantity")))
    val mean = prof.columns("l_quantity").distribution.get.mean
    val got = li.filter(Predicates.compile(
      ">= x :l_quantity:distribution/mean", F.col("l_quantity"), prof, None)).count()
    val want = li.filter(F.col("l_quantity") >= mean).count()
    assert(got == want && got > 0)
  }

  test("compiled predicates match hand-built Catalyst conditions") {
    import spark.implicits._
    val df = Seq(("red apple", 1200.0, 30), ("blue pear", 900.0, 10),
      ("dark red", 1500.0, 25)).toDF("name", "price", "size")
    def cnt(c: org.apache.spark.sql.Column) = df.filter(c).count()
    assert(cnt(Predicates.compile("and >= x 1000 <= x 1500", F.col("price"))) == 2)
    assert(cnt(Predicates.compile("% x red", F.col("name"))) == 2)
    assert(cnt(Predicates.compile("~ x red", F.col("name"))) == 1) // anchored match
    assert(cnt(Predicates.compile("not < x 25", F.col("size"))) == 2)
    // multi-column: component name resolves as a column reference
    val p = Predicates.parse("and >= price 1000 % name red")
    assert(cnt(p.toColumn(F.col)) == 2)
  }

  test("varopt validator sample is bounded and sized min(k, failures)") {
    val orders = table("orders")
    val res = Conditions.validate(orders,
      Seq(Condition("price_small", F.col("o_totalprice") <= 1000.0)),
      identityColumn = "o_orderkey", sampleSize = 7, varOptSample = true)
    val failures = res.head.failures
    assert(res.head.sample.length == math.min(7L, failures))
    assert(res.head.sample.distinct.length == res.head.sample.length)
  }
}
