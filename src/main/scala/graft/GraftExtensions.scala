package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions._
import graft.metrics.{BloomAgg, CardinalityAgg, DistributionAgg, FrequentItemsAgg, TopKAgg}

/** SQL surface for graft's native expressions and sketch aggregates.
  *
  * Two wiring paths, matching how Spark libraries ship functions:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (applied at session build, survives `newSession()`);
  *  - live session: `GraftFunctions.register(spark)`.
  *
  * After either, `spark.sql("SELECT simhash64(...) ...")` plans the same
  * codegen'd Catalyst expressions as the Column API — pure SQL users
  * (notebooks, Thrift server, dbt-style tooling) get the whole pipeline
  * toolkit without touching Scala.
  *
  * Sketch aggregates register as plain SQL aggregates (the analyzer
  * wraps a bare [[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction]]
  * in an AggregateExpression), so `SELECT distribution_agg(x) FROM t`
  * and `GROUP BY` / partial-final planning work exactly as from Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    // opt-in range-join rewrite (no-op until its width conf is set)
    ext.injectOptimizerRule(_ => graft.plans.BucketedRangeJoinRule)
  }
}

object GraftFunctions {

  private def litInt(args: Seq[Expression], i: Int, fn: String, default: => Int = {
    throw new IllegalArgumentException("missing required argument")
  }): Int =
    if (args.length <= i) default
    else args(i) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) =>
        // SQL integer literals can parse as LongType; reject out-of-range
        // values instead of silently truncating (4294967361 is not 65).
        if (v < Int.MinValue || v > Int.MaxValue) throw new IllegalArgumentException(
          s"$fn: argument ${i + 1} out of Int range: $v")
        v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  private def arity(fn: String, args: Seq[Expression], lo: Int, hi: Int): Unit =
    require(args.length >= lo && args.length <= hi,
      s"$fn expects $lo..$hi arguments, got ${args.length}")

  /** (name, builder) for every SQL-exposed function. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "shingle_ids" -> { args =>
      arity("shingle_ids", args, 1, 2)
      ShingleIds(args.head, litInt(args, 1, "shingle_ids", 3))
    },
    "minhash_signature" -> { args =>
      arity("minhash_signature", args, 1, 2)
      MinHashSignature(args.head, litInt(args, 1, "minhash_signature", 64))
    },
    "minhash_bands" -> { args =>
      arity("minhash_bands", args, 1, 3)
      MinHashBands(args.head,
        litInt(args, 1, "minhash_bands", 64), litInt(args, 2, "minhash_bands", 32))
    },
    "simhash64" -> { args =>
      arity("simhash64", args, 1, 1)
      SimHash64(args.head)
    },
    "term_vector" -> { args =>
      arity("term_vector", args, 2, 2)
      TermVector(args.head, litInt(args, 1, "term_vector"))
    },
    "repetition_stats" -> { args =>
      arity("repetition_stats", args, 1, 1)
      RepetitionStats(args.head)
    },
    "rolling_min_hash" -> { args =>
      arity("rolling_min_hash", args, 1, 2)
      RollingMinHash(args.head, litInt(args, 1, "rolling_min_hash", 16))
    },
    "cosine_similarity" -> { args =>
      arity("cosine_similarity", args, 2, 2)
      CosineSimilarity(args(0), args(1))
    },
    "distribution_agg" -> { args =>
      arity("distribution_agg", args, 1, 2)
      DistributionAgg(args.head, litInt(args, 1, "distribution_agg", 1024),
        DistributionAgg.DefaultQuantiles)
    },
    "cardinality_agg" -> { args =>
      arity("cardinality_agg", args, 1, 3)
      CardinalityAgg(args.head, litInt(args, 1, "cardinality_agg", 12),
        litInt(args, 2, "cardinality_agg", 1))
    },
    "frequent_items_agg" -> { args =>
      arity("frequent_items_agg", args, 1, 3)
      FrequentItemsAgg(args.head, litInt(args, 1, "frequent_items_agg", 7),
        litInt(args, 2, "frequent_items_agg", 32))
    },
    "top_k_agg" -> { args =>
      arity("top_k_agg", args, 3, 3)
      TopKAgg(args(0), args(1), litInt(args, 2, "top_k_agg"))
    },
    "bloom_agg" -> { args =>
      arity("bloom_agg", args, 2, 2)
      BloomAgg(args(0), litInt(args, 1, "bloom_agg"))
    },
    "unicode_normalize" -> { args =>
      arity("unicode_normalize", args, 1, 2)
      val form = if (args.length < 2) "NFC" else args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String,
          org.apache.spark.sql.types.StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize: argument 2 must be a string literal, got $other")
      }
      UnicodeNormalize(args.head, form)
    })

  /** Extension-injectable descriptions. */
  private[graft] val descriptions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftFunctions", name), b)
    }

  /** Register every graft function on an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
