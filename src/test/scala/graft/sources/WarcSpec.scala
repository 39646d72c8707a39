package graft.sources

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** WARC record parsing ([[Warc.warc_records]]): byte-true
  * Content-Length slicing, header handling, and the lenient
  * malformed-tail contract — the non-fixture shapes the
  * construction-inverse oracle cannot exercise. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(wtype: String, id: String, payload: String,
      uri: Option[String] = None, clOverride: Option[String] = None): String = {
    val cl = clOverride.getOrElse(
      payload.getBytes("UTF-8").length.toString)
    "WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("") +
      s"Content-Length: $cl\r\n\r\n" +
      payload + "\r\n\r\n"
  }

  private def parse(s: String) =
    Seq(Tuple1(s)).toDF("w")
      .select(F.explode(Warc.warc_records(F.col("w"))).as("r"))
      .select("r.warc_type", "r.record_id", "r.target_uri",
        "r.content_length", "r.payload")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))

  test("multi-record walk: types, ids, uris, byte-exact payloads") {
    val got = parse(
      rec("response", "<a>", "hello world", Some("http://x/1")) +
        rec("metadata", "<b>", "m1"))
    assert(got.toSeq == Seq(
      ("response", "<a>", "http://x/1", 11L, "hello world"),
      ("metadata", "<b>", null, 2L, "m1")))
  }

  test("payload containing WARC/1.0 does not split the record (length-driven)") {
    val tricky = "WARC/1.0\r\nWARC-Type: fake\r\n\r\nnested"
    val got = parse(rec("response", "<a>", tricky) + rec("response", "<b>", "next"))
    assert(got.length == 2)
    assert(got(0)._5 == tricky && got(1)._2 == "<b>")
  }

  test("multi-byte payload: Content-Length counts BYTES, chars decode intact") {
    val p = "Café né 北京" // bytes > chars
    val got = parse(rec("response", "<a>", p) + rec("response", "<b>", "tail"))
    assert(got(0)._4 == p.getBytes("UTF-8").length.toLong)
    assert(got(0)._5 == p)
    assert(got(1)._5 == "tail") // the walk resumed at the right byte
  }

  test("lenient tails: truncated/overrun/garbage drop the tail, keep the prefix") {
    val good = rec("response", "<a>", "ok")
    // declared length overruns the file
    assert(parse(good + rec("response", "<b>", "xy",
      clOverride = Some("999"))).length == 1)
    // missing Content-Length
    assert(parse(good + "WARC/1.0\r\nWARC-Type: response\r\n\r\npay\r\n\r\n")
      .length == 1)
    // unterminated header block
    assert(parse(good + "WARC/1.0\r\nWARC-Type: resp").length == 1)
    // garbage instead of a version line
    assert(parse(good + "not a warc record").length == 1)
    // clean truncation after the last terminator parses everything
    assert(parse(good).length == 1)
  }

  test("wrong terminator bytes stop the walk explicitly (no silent desync)") {
    // an under-declared Content-Length leaves payload bytes where the
    // \r\n\r\n terminator should be: the desynced walk would otherwise
    // mis-parse every later record — keep the damaged record, stop
    val bad = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <u>\r\nContent-Length: 2\r\n\r\npayload\r\n\r\n"
    val got = parse(bad + rec("response", "<after>", "next"))
    assert(got.length == 1 && got(0)._2 == "<u>" && got(0)._5 == "pa")
    // a truncated FINAL terminator (EOF inside \r\n\r\n) keeps the record
    val trunc = rec("response", "<t>", "ok").dropRight(2)
    assert(parse(trunc).map(_._2).toSeq == Seq("<t>"))
  }

  test("header names are case-insensitive; unknown headers ignored; null input") {
    val got = parse("WARC/1.0\r\n" +
      "warc-type: response\r\nWARC-RECORD-ID: <x>\r\n" +
      "X-Custom: noise\r\ncontent-length: 3\r\n\r\nabc\r\n\r\n")
    assert(got.toSeq == Seq(("response", "<x>", null, 3L, "abc")))
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("w")
      .select(Warc.warc_records(F.col("w"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("empty payload records (Content-Length 0) parse and the walk continues") {
    val got = parse(rec("warcinfo", "<i>", "") + rec("response", "<a>", "x"))
    assert(got.toSeq == Seq(("warcinfo", "<i>", null, 0L, ""),
      ("response", "<a>", null, 1L, "x")))
  }
}
