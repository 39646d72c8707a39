package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

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
