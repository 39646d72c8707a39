package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.normalizeUrl(F.col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("normalizeUrl: case, default ports, fragments, utm params, param order") {
    assert(norm("HTTPS://Example.COM:443/A/b?z=2&utm_source=x&a=1#frag") ==
      Seq("https://example.com/A/b?a=1&z=2"))
    // http:80 dropped, non-default port kept
    assert(norm("HTTP://host:80/x", "http://host:8080/x") ==
      Seq("http://host/x", "http://host:8080/x"))
    // https on http's default port is NOT default: kept
    assert(norm("https://host:80/") == Seq("https://host:80/"))
    // empty path -> '/', query right after host
    assert(norm("https://Host", "https://Host?b=2&a=1") ==
      Seq("https://host/", "https://host/?a=1&b=2"))
    // all params tracking -> no '?'
    assert(norm("https://h/p?utm_a=1&utm_b=2") == Seq("https://h/p"))
    // path case is preserved (paths are case-sensitive)
    assert(norm("https://H/CaSe") == Seq("https://h/CaSe"))
  }

  test("hostSuffixes enumerates every dot-suffix in order") {
    val got = Seq(Tuple1("a.b.c")).toDF("h")
      .select(Urls.hostSuffixes(F.col("h"))).head().getSeq[String](0)
    assert(got == Seq("a.b.c", "b.c", "c"))
    val single = Seq(Tuple1("localhost")).toDF("h")
      .select(Urls.hostSuffixes(F.col("h"))).head().getSeq[String](0)
    assert(single == Seq("localhost"))
  }

  test("filterBlockedDomains: exact + subdomain block; siblings and suffix-substrings survive") {
    val rows = Seq(
      (1L, "https://example.com/x"),        // exact hit
      (2L, "https://ads.example.com/x"),    // subdomain hit
      (3L, "https://notexample.com/x"),     // suffix-SUBSTRING is NOT a subdomain
      (4L, "https://EXAMPLE.ORG/x"),        // case-insensitive host, clean domain
      (5L, "https://sub.ok.net/x"))         // untouched
      .toDF("id", "url")
    val bl = Seq(Tuple1("Example.COM")).toDF("domain") // blocklist case-folds
    val kept = Urls.filterBlockedDomains(rows, "url", bl, "domain")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("filterBlockedDomains: NULL urls are kept; empty blocklist keeps everything") {
    val rows = Seq((1L, null.asInstanceOf[String]), (2L, "https://a.b/x"))
      .toDF("id", "url")
    val bl = Seq(Tuple1("a.b")).toDF("domain")
    val kept = Urls.filterBlockedDomains(rows, "url", bl, "domain")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    val none = Urls.filterBlockedDomains(rows, "url",
      Seq.empty[Tuple1[String]].toDF("domain"), "domain")
      .collect().map(_.getLong(0)).toSet
    assert(none == Set(1L, 2L))
  }

  test("blocklist past the broadcast budget degrades to a shuffle join, same answer") {
    // a 10^6-entry synthetic blocklist: entries bad0.example..bad999999.example
    // block half the corpus; the other half survives. Run once inside
    // the broadcast budget and once with the budget forced to zero
    // (pure shuffle path) — identical results either way.
    val docs = spark.range(2000).select(F.col("id"),
      F.concat(F.lit("https://host"), (F.col("id") % 1000).cast("string"),
        F.when(F.col("id") % 2 === 0, ".example").otherwise(".keepme"),
        F.lit("/p")).as("url"))
    val bl = spark.range(1000000).select(
      F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example")).as("domain"))
    def survivors(cap: Long) =
      Urls.filterBlockedDomains(docs, "url", bl, "domain", broadcastMaxEntries = cap)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val viaBroadcast = survivors(4000000L)
    val viaShuffle = survivors(0L)
    assert(viaBroadcast == viaShuffle)
    assert(viaBroadcast.size == 1000 && viaBroadcast.forall(_ % 2 == 1))
  }

  test("urlPathQuery: whole query kept, embedded '?' included, fragment stripped") {
    def pq(url: String): String =
      Seq(Tuple1(url)).toDF("u")
        .select(Urls.urlPathQuery(F.col("u"))).head().getString(0)
    assert(pq("https://h/p?a=1") == "/p?a=1")
    // an embedded second '?' belongs to the query: the tail must
    // survive (split_part's between-the-?s field would drop `?b=2`)
    assert(pq("https://h/p?redirect=/x?b=2") == "/p?redirect=/x?b=2")
    assert(pq("https://h/p") == "/p")
    assert(pq("https://h") == "/")
    assert(pq("https://h/p?a=1#frag") == "/p?a=1")
  }

  test("robots_disallow: RFC 9309 groups — * groups only, comments, shared headers") {
    def rules(txt: String): Seq[String] =
      Seq(Tuple1(txt)).toDF("t")
        .select(Urls.robots_disallow(F.col("t"))).head()
        .getSeq[String](0)
    // other-UA groups ignored; comments stripped; file order kept
    assert(rules("# policy\nUser-agent: evilbot\nDisallow: /\n\n" +
      "User-agent: *\nDisallow: /private/ # members\nDisallow: /tmp\n") ==
      Seq("D/private/", "D/tmp"))
    // Allow rules are collected with their kind marker
    assert(rules("User-agent: *\nDisallow: /\nAllow: /public/\n") ==
      Seq("D/", "A/public/"))
    // consecutive User-agent lines share one group (any * applies)
    assert(rules("User-agent: abot\nUser-agent: *\nDisallow: /x\n") == Seq("D/x"))
    // a User-agent AFTER rules (incl. an Allow) starts a NEW group
    assert(rules("User-agent: *\nAllow: /a\nUser-agent: bbot\nDisallow: /b\n") ==
      Seq("A/a"))
    // empty Disallow = allow-all (no rule); no * group at all = none
    assert(rules("User-agent: *\nDisallow:\n") == Seq())
    assert(rules("User-agent: googlebot\nDisallow: /\n") == Seq())
    // junk lines are skipped leniently
    assert(rules("not a directive\nUser-agent: *\nDisallow: /ok\n<<garbage>>") ==
      Seq("D/ok"))
  }

  test("robots_sitemaps: global directive, any group, any case; none -> empty") {
    def maps(txt: String): Seq[String] =
      Seq(Tuple1(txt)).toDF("t")
        .select(Urls.robots_sitemaps(F.col("t"))).head().getSeq[String](0)
    assert(maps("User-agent: bot\nDisallow: /\nSitemap: https://a/s.xml\n" +
      "User-agent: *\nsitemap: https://a/s2.xml.gz\n") ==
      Seq("https://a/s.xml", "https://a/s2.xml.gz"))
    assert(maps("User-agent: *\nDisallow: /\n") == Seq())
    // a mid-line mention is not a directive (anchored to line start)
    assert(maps("# see Sitemap: https://a/x\nuse the sitemap: tool\n") == Seq())
  }

  test("robots_matches: longest-match precedence — Allow carve-outs, Allow wins ties") {
    def disallowed(path: String, rules: Seq[String]): Boolean =
      Seq(Tuple1(path)).toDF("p")
        .select(Urls.robots_matches(F.col("p"),
          F.typedlit(rules))).head().getBoolean(0)
    val carve = Seq("D/", "A/public/")
    // the classic carve-out: Disallow / with Allow /public/
    assert(disallowed("/private/x", carve))
    assert(!disallowed("/public/page", carve))
    // longest PATTERN wins regardless of file order
    assert(disallowed("/public/secret", Seq("D/", "A/public/", "D/public/secret")))
    // a longer Allow that does NOT match can't save the path
    assert(disallowed("/public/secret", Seq("D/public/secret", "A/public/secret/")))
    assert(disallowed("/public/secret", Seq("D/public/secret", "A/public/")))
    // equal-length patterns: Allow wins the tie (RFC 9309 §2.2.2)
    assert(!disallowed("/page", Seq("D/page", "A/page")))
    assert(!disallowed("/page", Seq("A/page", "D/page")))
    // no matching rule at all: allowed
    assert(!disallowed("/elsewhere", Seq("D/private/")))
    // wildcard patterns still participate with their raw length
    assert(!disallowed("/dir/file.html", Seq("D/dir/", "A/dir/*.html")))
  }

  test("robots_matches: empty and unmarked legacy rules are lenient, never throw") {
    def disallowed(path: String, rules: Seq[String]): Boolean =
      Seq(Tuple1(path)).toDF("p")
        .select(Urls.robots_matches(F.col("p"),
          F.typedlit(rules))).head().getBoolean(0)
    // an empty rule string is skipped, not a charAt(0) crash
    assert(!disallowed("/x", Seq("")))
    assert(disallowed("/private/x", Seq("", "D/private/")))
    // an unmarked legacy rule (no A/D byte) is a Disallow over the whole
    // string — the pre-marker semantics — not a first-char-eaten pattern
    assert(disallowed("/private/x", Seq("/private/")))
    // ...and competes with its full octet length in precedence
    assert(!disallowed("/private/pub", Seq("/private/", "A/private/pub")))
  }

  test("filterRobotsDisallowed: path-prefix drop per host; unlisted hosts allowed") {
    val docs = Seq(
      (1L, "https://a.example/private/x"), // blocked: /private/ prefix
      (2L, "https://a.example/public/x"),  // kept
      (3L, "https://a.example/tmpfile"),   // blocked: /tmp prefix matches
      (4L, "https://b.example/private/x"), // kept: no robots row for b
      (5L, "https://A.EXAMPLE/private/y")  // blocked: host case-folds
    ).toDF("id", "url")
    val robots = Seq(
      ("a.example", "User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"),
      ("c.example", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "txt")
    val kept = Urls.filterRobotsDisallowed(docs, "url", robots, "host", "txt")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  test("RobotsMatch.ruleMatches: RFC 9309 '*' and '$' semantics") {
    val m = RobotsMatch.ruleMatches _
    // plain rules are prefix patterns
    assert(m("/private/x", "/private/"))
    assert(m("/tmpfile", "/tmp") && !m("/tm", "/tmp"))
    // '*' matches any run, including empty; mid-pattern '*' backtracks
    assert(m("/private/x", "/private/*"))
    assert(m("/private/", "/private/*"))
    assert(m("/cart/123/checkout/done", "/cart/*/checkout"))
    assert(!m("/cart/123/pay", "/cart/*/checkout"))
    assert(m("/a/b?sid=9", "/*?sid="))
    // '$' anchors the END: exact-path rules stop matching extensions
    assert(m("/p/9", "/p/9$") && !m("/p/93", "/p/9$"))
    assert(m("/x/deep.pdf", "/*.pdf$") && !m("/x/deep.pdfs", "/*.pdf$"))
  }

  test("filterRobotsDisallowed: wildcard/query rules fire; duplicate host rows union") {
    val docs = Seq(
      (1L, "https://a.example/private/x"),      // blocked by /private/* (capture 1)
      (2L, "https://a.example/search?q=cats"),  // blocked by /*?q= (capture 2)
      (3L, "https://a.example/p/9"),            // blocked by anchored /p/9$ (capture 2)
      (4L, "https://a.example/p/93"),           // kept: '$' must not over-match
      (5L, "https://a.example/ok")              // kept
    ).toDF("id", "url")
    // the host's policy arrives as TWO captures: rule lists must union
    val robots = Seq(
      ("a.example", "User-agent: *\nDisallow: /private/*\n"),
      ("a.example", "User-agent: *\nDisallow: /*?q=\nDisallow: /p/9$\n")
    ).toDF("host", "txt")
    val out = Urls.filterRobotsDisallowed(docs, "url", robots, "host", "txt")
    val kept = out.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(4L, 5L))
    // duplicate host rows must never duplicate corpus rows
    assert(out.count() == 2)
  }

  test("normalizeUrl collides order/tracking variants; urlHost extracts the site key") {
    val variants = Seq(
      "https://example.com/p?a=1&b=2",
      "HTTPS://EXAMPLE.com:443/p?b=2&a=1#x",
      "https://example.com/p?utm_c=9&a=1&b=2")
    assert(norm(variants: _*).distinct.size == 1)
    val hosts = variants.toDF("u").select(Urls.urlHost(F.col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(hosts.distinct == Seq("example.com"))
  }
}
