package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions.{count_where, top_k_agg, var_opt_sample}

/** Row-level predicates: the reference's ConditionCountMetric +
  * ConditionValidator (whylogs
  * `python/whylogs/core/metrics/condition_count_metric.py:27-270`,
  * `core/validators/condition_validator.py:16-108`).
  *
  * Predicates compile 1:1 to Catalyst columns (`rlike`, comparisons,
  * boolean algebra), so condition counting is a pure `count_if` pass that
  * fuses into the same scan as the rest of the profile — no extra job.
  */
final case class Condition(name: String, predicate: Column)

object Conditions {

  /** Fluent relation builders mirroring the reference's Predicate DSL
    * (`core/relations.py:66-205`). */
  def matches(c: Column, regex: String): Column = c.rlike(regex)
  def fullmatch(c: Column, regex: String): Column = c.rlike(s"^(?:$regex)$$")
  def equalTo(c: Column, v: Any): Column = c === F.lit(v)
  def lt(c: Column, v: Any): Column = c < F.lit(v)
  def le(c: Column, v: Any): Column = c <= F.lit(v)
  def gt(c: Column, v: Any): Column = c > F.lit(v)
  def ge(c: Column, v: Any): Column = c >= F.lit(v)

  /** Condition-count metric: one row (condition, matches, total). */
  def countsDF(df: DataFrame, conditions: Seq[Condition]): DataFrame = {
    val aggs = F.count(F.lit(1)).as("total") +:
      conditions.map(c => count_where(c.predicate && c.predicate.isNotNull).as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to long format for stable schema
    val total = F.col("total")
    val stacked = conditions.map(c =>
      F.struct(F.lit(c.name).as("condition"), F.col(c.name).as("matches"), total.as("total")))
    row.select(F.explode(F.array(stacked: _*)).as("r")).select("r.*")
  }

  /** Row-level validator: per-condition failure counts + a bounded sample
    * of failing identity values (reference samples k=10 via VarOpt,
    * `condition_validator.py:47,80-84`; here: deterministic first-k in
    * string order — documented divergence, same bound). Single pass: all
    * conditions' counts and samples come from ONE `df.agg` job; the
    * sample buffers are bounded heaps, never the failing-row set. */
  def validate(
      df: DataFrame,
      conditions: Seq[Condition],
      identityColumn: String,
      sampleSize: Int = 10,
      varOptSample: Boolean = false): Seq[ValidationResult] = {
    if (conditions.isEmpty) return Seq.empty
    val id = F.col(identityColumn).cast("string")
    val aggs = conditions.zipWithIndex.flatMap { case (c, i) =>
      val fail = !F.coalesce(c.predicate, F.lit(false))
      val sampler =
        if (varOptSample) var_opt_sample(F.when(fail, id), sampleSize)
        else top_k_agg(F.lit(0.0), F.when(fail, id), sampleSize, largest = false)
      Seq(count_where(fail).as(s"__f$i"), sampler.as(s"__s$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    conditions.zipWithIndex.map { case (c, i) =>
      val sample =
        if (varOptSample) row.getAs[scala.collection.Seq[String]](s"__s$i").toSeq
        else row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](s"__s$i")
          .map(_.getAs[String]("id")).toSeq
      ValidationResult(c.name, row.getAs[Long](s"__f$i"), sample)
    }
  }

  /** Distributed validator summary as a DataFrame (no driver loops):
    * (condition, failures, total). */
  def validateDF(df: DataFrame, conditions: Seq[Condition]): DataFrame = {
    val aggs = F.count(F.lit(1)).as("total") +: conditions.map(c =>
      count_where(!F.coalesce(c.predicate, F.lit(false))).as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = conditions.map(c =>
      F.struct(F.lit(c.name).as("condition"), F.col(c.name).as("failures"),
        F.col("total").as("total")))
    row.select(F.explode(F.array(stacked: _*)).as("r")).select("r.*")
  }
}

final case class ValidationResult(condition: String, failures: Long, sample: Seq[String])

/** Validator failure actions (reference
  * `core/validators/condition_validator.py:16-108`): callbacks fired
  * per condition after a validation pass when failures occurred. Runs
  * driver-side over the collected per-condition summaries — actions see
  * counts + the bounded sample, never the raw failing rows. */
object ValidatorActions {
  type Action = ValidationResult => Unit

  /** Run `validate` then trigger `action` for every condition with >0
    * failures; returns the results unchanged. */
  def withActions(results: Seq[ValidationResult], actions: Seq[Action]): Seq[ValidationResult] = {
    results.filter(_.failures > 0).foreach(r => actions.foreach(_(r)))
    results
  }

  /** The reference's canned actions. */
  def logAction(log: String => Unit = System.err.println): Action =
    r => log(s"[validator] ${r.condition}: ${r.failures} failing rows; sample=${r.sample.take(5).mkString(",")}")

  def raiseAction: Action =
    r => throw new IllegalStateException(
      s"validator ${r.condition} failed on ${r.failures} rows")
}
