package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the key-normalization step of web-corpus
  * dedup (CommonCrawl-style pipelines dedup by canonical URL before
  * ever touching content): scheme/host lowercased, default ports
  * dropped (https:443, http:80), fragments stripped, empty path
  * normalized to `/`, tracking parameters (`utm_*`) removed, and the
  * remaining query parameters SORTED — so `?b=2&a=1` and `?a=1&b=2`
  * collide, which is the point.
  *
  * Pure codegen'd string expressions (split_part/filter/sort_array) —
  * map-only, no UDF, one scan at any corpus size — and every step has
  * an identical DuckDB spelling, so canonicalization is oracle-checked
  * end to end (`url_canonicalize`). Single-`?` URLs assumed (split_part
  * semantics, same in both engines). */
object Urls {

  def normalizeUrl(url: Column): Column = {
    val scheme = F.lower(F.split_part(url, F.lit("://"), F.lit(1)))
    val rest = F.split_part(F.split_part(url, F.lit("://"), F.lit(2)),
      F.lit("#"), F.lit(1))
    val pre = F.split_part(rest, F.lit("?"), F.lit(1))
    val query = F.split_part(rest, F.lit("?"), F.lit(2))
    val hostport = F.split_part(pre, F.lit("/"), F.lit(1))
    val path = F.when(F.length(pre) === F.length(hostport), F.lit("/"))
      .otherwise(pre.substr(F.length(hostport) + 1, F.length(pre)))
    val host = F.lower(F.split_part(hostport, F.lit(":"), F.lit(1)))
    val port = F.split_part(hostport, F.lit(":"), F.lit(2))
    val keepPort = (port =!= "") &&
      !((scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"))
    val params = F.filter(F.split(query, "&"),
      p => F.length(p) > 0 && !p.rlike("^utm_"))
    val q2 = F.array_join(F.sort_array(params), "&")
    F.concat(scheme, F.lit("://"), host,
      F.when(keepPort, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
      path,
      F.when(q2 === "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)))
  }

  /** The canonical host alone — the per-site rollup key. */
  def urlHost(url: Column): Column = {
    val rest = F.split_part(F.split_part(url, F.lit("://"), F.lit(2)),
      F.lit("#"), F.lit(1))
    val pre = F.split_part(rest, F.lit("?"), F.lit(1))
    F.lower(F.split_part(F.split_part(pre, F.lit("/"), F.lit(1)),
      F.lit(":"), F.lit(1)))
  }

  /** The URL's path (leading `/`, query/fragment stripped, empty path
    * normalized to `/`) — the robots.txt matching key. */
  def urlPath(url: Column): Column = {
    val rest = F.split_part(F.split_part(url, F.lit("://"), F.lit(2)),
      F.lit("#"), F.lit(1))
    val pre = F.split_part(rest, F.lit("?"), F.lit(1))
    val hostport = F.split_part(pre, F.lit("/"), F.lit(1))
    F.when(F.length(pre) === F.length(hostport), F.lit("/"))
      .otherwise(pre.substr(F.length(hostport) + 1, F.length(pre)))
  }

  /** The `Disallow:` path prefixes that apply to `User-agent: *` in a
    * robots.txt body, in file order — the CONSERVATIVE compliance
    * subset (RFC 9309 grouping: consecutive `User-agent` lines form a
    * group header and the group's rules apply if any of them is `*`;
    * comments stripped; `Allow:`/longest-match precedence deliberately
    * NOT modeled — a prefix that any applicable Disallow matches is
    * dropped, the good-citizen approximation every bulk crawler
    * ships). Empty `Disallow:` (allow-all) contributes no prefix.
    * Map-only native expression; NULL body → NULL. */
  def robots_disallow(robotsTxt: Column): Column =
    exprColumn(RobotsDisallow(columnExpr(robotsTxt)))

  /** Drop rows whose URL's path is disallowed for `User-agent: *` by
    * the host's robots.txt — the compliance filter beside
    * [[graft.pipeline.HtmlExtract.robotsNoindex]] (that one is
    * page-level; this is crawl-level). `robots` carries one row per
    * host: `(host, robots.txt body)`; hosts with no row (or an
    * unparseable/empty body) are fully allowed. Rules parse MAP-ONLY
    * on the (small) robots side; the join is host-equality with the
    * same broadcast-budget-or-shuffle degrade as
    * [[filterBlockedDomains]]; the per-row prefix check is a bounded
    * `exists` over that host's rule array. */
  def filterRobotsDisallowed(df: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      broadcastMaxEntries: Long = 4000000L): DataFrame = {
    val rules = robots.select(
      F.lower(F.col(hostCol)).as("__rhost"),
      robots_disallow(F.col(txtCol)).as("__rules"))
      .filter(F.col("__rhost").isNotNull && F.size(F.col("__rules")) > 0)
    val rulesSide =
      if (rules.count() <= broadcastMaxEntries) F.broadcast(rules) else rules
    val keyed = df
      .withColumn("__host", urlHost(F.col(urlCol)))
      .withColumn("__path", urlPath(F.col(urlCol)))
    keyed.join(rulesSide, F.col("__host") === F.col("__rhost"), "left")
      .filter(F.col("__rules").isNull ||
        !F.exists(F.col("__rules"), r => F.col("__path").startsWith(r)))
      .drop("__host", "__path", "__rhost", "__rules")
  }

  /** A host's dot-suffixes (`a.b.c` → `[a.b.c, b.c, c]`) — the bounded
    * equality-join key set for domain-blocklist matching (a host has at
    * most its label count of suffixes, ~≤10 in the wild). */
  def hostSuffixes(host: Column): Column = {
    val labels = F.split(host, "\\.")
    F.transform(F.sequence(F.lit(0), F.size(labels) - 1),
      i => F.array_join(F.slice(labels, i + 1, F.size(labels) - i), "."))
  }

  /** Drop rows whose URL's host IS a blocked domain or is a SUBDOMAIN
    * of one (`example.com` in the blocklist blocks `ads.example.com`) —
    * the crawl-filter stage that follows canonicalization in every
    * web-corpus pipeline.
    *
    * Scale shape: each host explodes into its ≤ label-count
    * dot-suffixes and EQUALITY-semi-joins the blocklist — a hash join
    * over short keys, never one LIKE/regex per blocklist entry (a real
    * blocklist is ~10⁶ domains; pattern-per-entry is a 10⁶-way scan
    * per row). The anti-join back is keyed on the same host column.
    * Blocklist entries are lowercased and deduped; rows with NULL urls
    * are kept (no host to block on).
    *
    * Broadcast budget: the blocklist broadcasts only while its
    * (deduped) entry count fits `broadcastMaxEntries` — a ~10⁶-domain
    * list is ~30-60 MB broadcast, fine; past the budget the suffix
    * join falls back to a SHUFFLE hash join on the same equality keys
    * instead of silently OOMing the driver (the Bloom-family cap
    * pattern: bounded-or-degrade, never unbounded). The count is one
    * cheap aggregate over the (small relative to the corpus) list. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocklist: DataFrame, domainCol: String,
      broadcastMaxEntries: Long = 4000000L): DataFrame = {
    val keyed = df.withColumn("__host", urlHost(F.col(urlCol)))
    val bl = blocklist
      .select(F.lower(F.col(domainCol)).as("__bdom"))
      .filter(F.col("__bdom").isNotNull).distinct()
    val blSide = if (bl.count() <= broadcastMaxEntries) F.broadcast(bl) else bl
    val blockedHosts = keyed
      .select(F.col("__host"), F.explode(hostSuffixes(F.col("__host"))).as("__suf"))
      .join(blSide, F.col("__suf") === F.col("__bdom"))
      .select("__host").distinct()
    keyed.join(blockedHosts, Seq("__host"), "left_anti").drop("__host")
  }
}

/** `array<string>` of `User-agent: *` Disallow prefixes — see
  * [[Urls.robots_disallow]]. */
case class RobotsDisallow(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "robots_disallow"

  override def nullSafeEval(input: Any): Any =
    RobotsDisallow.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.pipeline.RobotsDisallow.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): RobotsDisallow =
    copy(child = newChild)
}

object RobotsDisallow {

  /** RFC 9309 group walk, `*` groups only, Disallow prefixes in file
    * order. Lenient: junk lines are skipped, never thrown. */
  def parse(txt: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var applies = false  // current group has a `*` user-agent
    var inHeader = false // still reading the group's User-agent lines
    txt.toString.split("\n").foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val v = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              // a User-agent line after rules starts a NEW group
              if (!inHeader) { applies = false; inHeader = true }
              if (v == "*") applies = true
            case "disallow" =>
              inHeader = false
              if (applies && v.nonEmpty) out += UTF8String.fromString(v)
            case _ => // allow / sitemap / crawl-delay / unknown: ends the header
              inHeader = false
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}
