package graft

import org.apache.spark.sql.{Column, functions => F}

import graft.api.{DerivedColumn, KindDerived, MetricPlugin, MetricRegistry, Profiler, UdfSchema}
import graft.core.LogicalKind

/** UDF schema pre-pass + metric plugin registry. */
class UdfSpec extends SparkSpec {

  test("by-name and by-kind derived columns expand and profile") {
    import spark.implicits._
    val df = Seq((1L, "ab"), (2L, "cdef"), (3L, "x")).toDF("id", "s")
    val schema = UdfSchema(
      derived = Seq(DerivedColumn("id_sq", F.col("id") * F.col("id"))),
      byKind = Seq(KindDerived(LogicalKind.Str, "len", c => F.length(c))))
    val out = schema(df)
    assert(schema.outputColumns(df) == Seq("id_sq", "s_len"))
    val view = new Profiler().profile(out, Some(schema.outputColumns(df)))
    assert(view.columns("id_sq").ints.get.max.get == 9L)
    assert(view.columns("s_len").ints.get.max.get == 4L)
  }

  test("plugin metrics join the same aggregation pass; registry resolves") {
    import spark.implicits._
    val df = Seq(1.0, 2.5, 3.5).toDF("v")
    val plugin = new MetricPlugin {
      val namespace = "exact_sum"
      def appliesTo(column: String, kind: LogicalKind) = kind == LogicalKind.Fractional
      def aggColumn(c: Column) = F.struct(graft.functions.exact_sum(c).as("sum"))
    }
    MetricRegistry.register(plugin)
    try {
      val p = new Profiler().withRegisteredPlugins
      val row = p.profileDF(df).select(F.col("v.exact_sum.sum")).collect()(0)
      assert(row.getDouble(0) == 7.0)
    } finally MetricRegistry.unregister("exact_sum")
  }
}
