package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.core.LogicalKind

/** UDF-schema pre-pass (reference `experimental/core/udf_schema.py:36-160`
  * and `register_metric_udf`, `experimental/core/metrics/udf_metric.py`):
  * derived columns are declared once and computed as a projection BEFORE
  * profiling, then profiled like any other column — in Spark the "UDF"
  * is ideally a Column expression (codegen'd, pushdown-friendly), with
  * `F.udf` closures as the escape hatch.
  *
  * Two declaration styles, mirroring the reference:
  *  - by name: an output column computed from the input row
  *  - by logical kind: expands to one output per matching input column
  *    (the reference's type-matched UDF registration), named
  *    `<input>_<suffix>` (the reference uses `column.udf`, but dotted
  *    names collide with Spark's struct-field resolution).
  */
final case class DerivedColumn(name: String, expr: Column)

final case class KindDerived(kind: LogicalKind, suffix: String, make: Column => Column)

final case class UdfSchema(
    derived: Seq[DerivedColumn] = Nil,
    byKind: Seq[KindDerived] = Nil) {

  /** Apply the pre-pass: input df → df with all derived columns. */
  def apply(df: DataFrame): DataFrame = {
    val named = derived.foldLeft(df)((d, dc) => d.withColumn(dc.name, dc.expr))
    byKind.foldLeft(named) { (d, kd) =>
      val matches = df.schema.fields
        .filter(f => LogicalKind.of(f.dataType) == kd.kind).map(_.name)
      matches.foldLeft(d)((dd, c) =>
        dd.withColumn(s"${c}_${kd.suffix}", kd.make(F.col(c))))
    }
  }

  /** The derived column names (for targeting the profiler at them). */
  def outputColumns(df: DataFrame): Seq[String] =
    derived.map(_.name) ++ byKind.flatMap(kd =>
      df.schema.fields.filter(f => LogicalKind.of(f.dataType) == kd.kind)
        .map(f => s"${f.name}_${kd.suffix}"))
}

/** Custom metric plugin (reference `register_metric` /
  * `CustomMetricBase`, `core/metrics/metrics.py:57-63,641-665`): a
  * namespace plus an aggregate-Column builder, attached per column by a
  * resolver predicate. The aggregate participates in the same single
  * profiling pass as the built-in metrics (partial agg + one exchange). */
trait MetricPlugin extends Serializable {
  def namespace: String
  def appliesTo(column: String, kind: LogicalKind): Boolean
  /** Aggregate expression(s) for one column, typically a struct. */
  def aggColumn(c: Column): Column
}

/** Process-wide plugin registry keyed by namespace (the reference's
  * `_METRIC_DESERIALIZER_REGISTRY` analog for resolution). Profilers can
  * also take plugins explicitly — the registry is the convenience path. */
object MetricRegistry {
  private val plugins = new java.util.concurrent.ConcurrentHashMap[String, MetricPlugin]()
  def register(p: MetricPlugin): Unit = plugins.put(p.namespace, p)
  def unregister(namespace: String): Unit = plugins.remove(namespace)
  def all: Seq[MetricPlugin] = {
    import scala.jdk.CollectionConverters._
    plugins.values.asScala.toSeq.sortBy(_.namespace)
  }
}
