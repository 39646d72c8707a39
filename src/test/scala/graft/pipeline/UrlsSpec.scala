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
