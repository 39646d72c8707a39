package graft

import org.apache.spark.sql.{functions => F}

import graft.api.Profiler
import graft.core.{MetricConfig, Namespace, ResolverSpec}

/** unicode_range MultiMetric semantics (reference
  * `core/metrics/unicode_range.py`: NFD + lowercase, overlapping ranges
  * all count, UNKNOWN catches the rest, string_length tracks the raw
  * length). */
class UnicodeRangeSpec extends SparkSpec {

  test("per-range counts: overlap, NFD decomposition, UNKNOWN, string_length") {
    import spark.implicits._
    // "Ab1é": lowercase → "ab1é"; NFD splits é into 'e' + U+0301.
    // latin-lower: a,b,e = 3; digits: 1; basic-latin: a,b,1,e = 4;
    // UNKNOWN: U+0301 (not in any default range) = 1.
    val df = Seq("Ab1é").toDF("s")
    val p = new Profiler(MetricConfig(trackUnicodeRanges = true),
      ResolverSpec(byKind = _ => Seq(Namespace.Counts)))
    val view = p.profile(df)
    val subs = view.columns("s").subMetrics(Namespace.UnicodeRange)
    def mx(nm: String) = subs(nm).ints.get.max.get
    assert(mx("latin-lower") == 3)
    assert(mx("latin-upper") == 0)
    assert(mx("digits") == 1)
    assert(mx("basic-latin") == 4)
    assert(mx("UNKNOWN") == 1)
    assert(mx("string_length") == 4) // raw value length, pre-NFD
    assert(subs("digits").counts.get.n == 1)
  }

  test("MultiMetric merges through profile merge and GRFT1 serde") {
    import spark.implicits._
    val p = new Profiler(MetricConfig(trackUnicodeRanges = true),
      ResolverSpec(byKind = _ => Seq(Namespace.Counts)))
    val a = p.profile(Seq("abc", "x9").toDF("s"))
    val b = p.profile(Seq("QQ!").toDF("s"))
    val merged = a.merge(b)
    val subs = merged.columns("s").subMetrics(Namespace.UnicodeRange)
    assert(subs("latin-lower").ints.get.max.get == 3)
    assert(subs("digits").counts.get.n == 3)
    val rt = graft.profile.ProfileSerde.fromBytes(graft.profile.ProfileSerde.toBytes(merged))
    assert(rt.summaryRows == merged.summaryRows)
  }
}
