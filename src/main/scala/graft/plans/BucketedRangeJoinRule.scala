package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule that rewrites a naive inequality range join
  *
  *   `points JOIN intervals ON <equi keys> AND t >= lo AND t <= hi`
  *
  * into [[graft.pipeline.RangeJoin]]'s bucketed shape: the point side
  * gains `bucket(t)`, the interval side explodes to `sequence(bucket(lo),
  * bucket(hi))`, and the bucket equality joins the equi-key list — so SQL
  * users who write the natural BETWEEN join get the (key, bucket)
  * equi-join plan instead of a per-key quadratic pair blowup, with the
  * original predicate kept as the exact filter.
  *
  * Soundness: `lo ≤ t ≤ hi` implies `bucket(t) ∈ [bucket(lo),
  * bucket(hi)]`, the point's bucket is unique (no duplicate pairs), the
  * original conjuncts all remain, and a NULL anywhere nulls the added
  * equality exactly where the original predicate was already NULL. An
  * inverted interval (lo > hi) generates a descending bucket sequence
  * whose extra candidate pairs the kept predicate rejects — still
  * correct, merely unpruned, matching the empty original result.
  *
  * Deliberately conservative — the rewrite fires only for:
  *  - INNER joins with at least one equi-key conjunct;
  *  - integral (int/long) t / lo / hi with |value| < 2^53 semantics
  *    (the bucket is floor(t / width) in double space, the same formula
  *    as the manual operator — micros/millis epochs qualify);
  *  - `spark.graft.rangeJoin.bucketWidth` set to a positive long
  *    (opt-in: the right width is data-dependent, ≈ the median interval
  *    length, and only the user knows it).
  *
  * Wire up with `spark.experimental.extraOptimizations` (live session)
  * or `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object BucketedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  /** Replication-factor bound: an interval spanning more buckets than
    * this fails at runtime with a clear message instead of exploding to
    * millions of rows (or hitting `sequence`'s 2^31 hard limit) — the
    * session-wide rewrite must never turn a slow-but-working BETWEEN
    * join into a silent OOM on one open-ended sentinel interval. */
  val MaxBucketsKey = "spark.graft.rangeJoin.maxBucketsPerInterval"

  private def width: Long =
    try conf.getConfString(WidthKey, "0").toLong catch {
      case _: NumberFormatException => 0L
    }

  private def maxBuckets: Long =
    try conf.getConfString(MaxBucketsKey, "1000000").toLong catch {
      case _: NumberFormatException => 1000000L
    }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(t / width) as the manual operator computes it. */
  private def bucket(t: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(asLong(t), org.apache.spark.sql.types.DoubleType),
      Literal(w.toDouble))), LongType)

  private def from(attrs: AttributeSet, e: Expression): Boolean =
    e.references.nonEmpty && e.references.subsetOf(attrs)

  def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !j.isStreaming &&
            // idempotence: never touch a join this rule already rewrote
            !cond.references.exists(_.name.startsWith("__rj_")) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val equi = conjuncts.exists {
          case EqualTo(a, b) =>
            (from(left.outputSet, a) && from(right.outputSet, b)) ||
              (from(right.outputSet, a) && from(left.outputSet, b))
          case _ => false
        }
        // one lower + one upper bound on the SAME left expression,
        // bounded by right-side expressions
        val lower = conjuncts.collectFirst {
          case GreaterThanOrEqual(t, lo)
              if from(left.outputSet, t) && from(right.outputSet, lo) &&
                integral(t) && integral(lo) => (t, lo)
          case LessThanOrEqual(lo, t)
              if from(left.outputSet, t) && from(right.outputSet, lo) &&
                integral(t) && integral(lo) => (t, lo)
        }
        val upper = conjuncts.collectFirst {
          case LessThanOrEqual(t, hi)
              if from(left.outputSet, t) && from(right.outputSet, hi) &&
                integral(t) && integral(hi) => (t, hi)
          case GreaterThanOrEqual(hi, t)
              if from(left.outputSet, t) && from(right.outputSet, hi) &&
                integral(t) && integral(hi) => (t, hi)
        }
        (lower, upper) match {
          case (Some((t, lo)), Some((t2, hi))) if t.semanticEquals(t2) && equi =>
            val bL = Alias(bucket(t, w), "__rj_b")()
            val newLeft = Project(left.output :+ bL, left)
            // per-interval replication guard: fail fast with a clear
            // message rather than explode an open-ended interval
            val bLo = bucket(lo, w)
            val bHi = bucket(hi, w)
            val guardedHi = If(
              GreaterThanOrEqual(Subtract(bHi, bLo), Literal(maxBuckets)),
              Cast(new RaiseError(Literal(
                s"bucketed range join: interval spans more than $maxBuckets " +
                  s"buckets at width $w — raise $WidthKey, raise " +
                  s"$MaxBucketsKey, or pre-filter open-ended intervals")),
                LongType),
              bHi)
            val gen = Explode(Sequence(
              bLo, guardedHi, None, Some(conf.sessionLocalTimeZone)))
            val bR = AttributeReference("__rj_bs", LongType)()
            val newRight = Generate(gen, unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(bR), child = right)
            val newCond = And(cond, EqualTo(bL.toAttribute, bR))
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}
