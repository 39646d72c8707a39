package graft.functions

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** HTTP response split ([[Http]]): status / content-type / body over
  * real-shaped and degenerate payloads — the leniency contract that
  * lets pre-split corpora flow through unchanged. */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def split(payload: String) = {
    val r = Seq(Tuple1(payload)).toDF("p")
      .select(
        Http.httpStatus(F.col("p")).as("status"),
        Http.httpContentType(F.col("p")).as("ct"),
        Http.httpBody(F.col("p")).as("body"))
      .head()
    (if (r.isNullAt(0)) null else Integer.valueOf(r.getInt(0)),
      r.getString(1), r.getString(2))
  }

  test("full HTTP response: status, content-type, body after first blank line") {
    val p = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      "X-Crawler: cc\r\n\r\n" +
      "<html>body with\r\n\r\nits own blank line</html>"
    assert(split(p) == (200, "text/html; charset=utf-8",
      "<html>body with\r\n\r\nits own blank line</html>"))
  }

  test("header name matching is case-insensitive; value trimmed") {
    val p = "HTTP/1.0 404 Not Found\r\ncontent-TYPE:  application/json \r\n\r\n{}"
    assert(split(p) == (404, "application/json", "{}"))
  }

  test("non-HTTP payload IS the body (pre-split corpora flow unchanged)") {
    assert(split("<p>bare html</p>") == (null, null, "<p>bare html</p>"))
    // a body that merely MENTIONS a content-type never yields one
    assert(split("text Content-Type: evil\r\n\r\nx")._2 == null)
  }

  test("headers-only payload (no blank line): empty body, headers still parsed") {
    val p = "HTTP/1.1 304 Not Modified\r\nContent-Type: text/plain"
    assert(split(p) == (304, "text/plain", ""))
  }

  test("unparseable status line: NULL status, body still split") {
    val p = "HTTP/1.1 weird\r\nContent-Type: a/b\r\n\r\npayload"
    assert(split(p) == (null, "a/b", "payload"))
  }

  private def dechunked(body: String): String = {
    val r = Seq(Tuple1(body)).toDF("b")
      .select(Http.dechunk(F.col("b"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("dechunk: sizes in hex BYTES, extensions ignored, trailers ignored") {
    // 'Café' is 5 bytes / 4 chars — a char-counting decoder would split it
    val b = "5;ext=1\r\nCafé\r\nC\r\n and welcome\r\n0\r\nX-Trailer: t\r\n\r\n"
    assert(dechunked(b) == "Café and welcome")
    // empty body: just the terminal chunk
    assert(dechunked("0\r\n\r\n") == "")
    // uppercase hex
    assert(dechunked("A\r\n0123456789\r\n0\r\n\r\n") == "0123456789")
  }

  test("dechunk: malformed framing yields NULL, never an exception") {
    assert(dechunked("zz\r\nxx\r\n0\r\n\r\n") == null) // bad hex
    assert(dechunked("ff\r\nshort\r\n0\r\n\r\n") == null) // size overruns body
    assert(dechunked("5\r\nhelloXX0\r\n\r\n") == null) // missing CRLF after data
    assert(dechunked("5\r\nhello\r\n") == null) // truncated before terminal chunk
    assert(dechunked("") == null)
    assert(dechunked("\r\nhello\r\n0\r\n\r\n") == null) // empty size field
  }

  test("httpDecodedBody: chunked responses reassemble; plain responses pass raw") {
    val chunked = "HTTP/1.1 200 OK\r\nTransfer-Encoding: CHUNKED\r\n\r\n" +
      "6\r\nhello \r\n5\r\nworld\r\n0\r\n\r\n"
    // multi-coding: chunked must be the FINAL coding (RFC 9112), so the
    // capture is chunk-framed outermost — equality against the whole
    // value would miss this and leak hex size lines into the text
    val multi = "HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n" +
      "6\r\nhello \r\n5\r\nworld\r\n0\r\n\r\n"
    val plain = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello world"
    val got = Seq(chunked, multi, plain).map(Tuple1(_)).toDF("p")
      .select(Http.httpDecodedBody(F.col("p"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("hello world", "hello world", "hello world"))
  }

  test("contentEncodingOf / residualTransferCoding: header value, final-coding aware") {
    def codings(p: String) = {
      val r = Seq(Tuple1(p)).toDF("p")
        .select(Http.contentEncodingOf(F.col("p")).as("ce"),
          Http.residualTransferCoding(F.col("p")).as("rt"))
        .head()
      (r.getString(0), r.getString(1))
    }
    assert(codings("HTTP/1.1 200 OK\r\nContent-Encoding: GZIP\r\n\r\nx") ==
      ("gzip", null))
    // chunked alone leaves nothing residual; gzip, chunked leaves gzip
    assert(codings("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nx") ==
      (null, null))
    assert(codings("HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\nx") ==
      (null, "gzip"))
    // a (non-compliant but seen) bare gzip transfer coding is residual
    assert(codings("HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\nx") ==
      (null, "gzip"))
    assert(codings("HTTP/1.1 200 OK\r\n\r\nx") == (null, null))
  }

  test("decodeContentCoding: gzip, x-gzip, deflate (zlib AND raw), identity, right-to-left lists") {
    def decode(body: Array[Byte], codings: String): String = {
      val r = Seq(Tuple1(body)).toDF("b")
        .select(Http.decodeContentCoding(F.col("b"), F.lit(codings))).head()
      if (r.isNullAt(0)) null
      else new String(r.getAs[Array[Byte]](0), "UTF-8")
    }
    val plain = "hello content codings".getBytes("UTF-8")
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.close(); bos.toByteArray
    }
    def deflate(nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(plain); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    assert(decode(gz, "gzip") == "hello content codings")
    assert(decode(gz, "x-gzip") == "hello content codings")
    assert(decode(plain, "identity") == "hello content codings")
    // RFC 9110 deflate is a zlib container, but raw streams are common
    // in the wild — both must decode
    assert(decode(deflate(nowrap = false), "deflate") == "hello content codings")
    assert(decode(deflate(nowrap = true), "deflate") == "hello content codings")
    // list applies right-to-left: identity wrapper around gzip
    assert(decode(gz, "gzip, identity") == "hello content codings")
    // unknown codings and corrupt data yield NULL, never an exception
    assert(decode(gz, "br") == null)
    assert(decode(plain, "gzip") == null)
    assert(decode(gz.take(5), "gzip") == null)
  }

  test("bomCharsetOf / stripBom: detection, WHATWG shapes, no-BOM passthrough") {
    def bom(bytes: Array[Byte]): (String, Array[Byte]) = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(Http.bomCharsetOf(F.col("b")).as("c"),
          Http.stripBom(F.col("b")).as("s")).head()
      (r.getString(0), r.getAs[Array[Byte]](1))
    }
    val utf8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "hi".getBytes("UTF-8")
    val be = Array(0xFE.toByte, 0xFF.toByte) ++ "hi".getBytes("UTF-16BE")
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ "hi".getBytes("UTF-16LE")
    assert(bom(utf8)._1 == "utf-8" && bom(utf8)._2.toSeq == "hi".getBytes("UTF-8").toSeq)
    assert(bom(be)._1 == "utf-16be" && bom(be)._2.toSeq == "hi".getBytes("UTF-16BE").toSeq)
    assert(bom(le)._1 == "utf-16le" && bom(le)._2.toSeq == "hi".getBytes("UTF-16LE").toSeq)
    // no BOM: NULL charset, bytes pass through untouched
    val plain = "plain".getBytes("UTF-8")
    val (c, s) = bom(plain)
    assert(c == null && s.toSeq == plain.toSeq)
    // short inputs never throw
    assert(bom(Array[Byte]())._1 == null)
    assert(bom(Array(0xEF.toByte))._1 == null)
  }

  test("crawlTextFields: field-for-field equal to the composed column functions") {
    import graft.pipeline.HtmlExtract
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    val payloads: Seq[Array[Byte]] = Seq(
      // plain response
      b("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<p>plain &amp; simple</p>"),
      // chunked
      b("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\n<p>a \r\n4\r\nb</p\r\n1\r\n>\r\n0\r\n\r\n"),
      // gzip content coding
      b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Encoding: gzip\r\n\r\n") ++ gz("<p>coded</p>"),
      // gzip, chunked (residual transfer coding under the framing)
      {
        val inner = gz("<p>double</p>")
        b("HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n") ++
          b(f"${inner.length}%x\r\n") ++ inner ++ b("\r\n0\r\n\r\n")
      },
      // unknown coding -> NULL text
      b("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n") ++ Array[Byte](1, 2, 3),
      // latin-1 page declared by header
      b("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n") ++
        "<p>café mañana</p>".getBytes("ISO-8859-1"),
      // charset only in the page's meta
      b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><head><meta charset=\"windows-1252\"></head><body>x</body></html>"),
      // UTF-16LE BOM, no declaration anywhere else
      b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n") ++
        Array(0xFF.toByte, 0xFE.toByte) ++ "<p>bom</p>".getBytes("UTF-16LE"),
      // UTF-8 BOM behind a LYING header
      b("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n") ++
        Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "<p>é</p>".getBytes("UTF-8"),
      // noindex page, reversed-attribute meta, 'none' shorthand
      b("HTTP/1.1 200 OK\r\n\r\n<meta name=\"robots\" content=\"NOINDEX, follow\"><p>out</p>"),
      b("HTTP/1.1 200 OK\r\n\r\n<meta content=\"none\" name='robots'><p>out2</p>"),
      // bare html (no envelope), headers-only, unparseable status
      b("<p>bare &lt;html&gt;</p>"),
      b("HTTP/1.1 304 Not Modified\r\nContent-Type: text/plain"),
      b("HTTP/1.1 weird\r\nContent-Type: a/b\r\n\r\npayload"),
      // malformed chunked framing -> NULL text
      b("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nxx\r\n0\r\n\r\n"))
    val df = payloads.map(Tuple1(_)).toDF("payload_bytes")
    // the composed COLUMN chain (the oracle-transparent spelling)
    val latin = F.decode(F.col("payload_bytes"), "ISO-8859-1")
    val ct = Http.httpContentType(latin)
    val rawBody = F.encode(Http.httpBody(latin), "ISO-8859-1")
    val dechunked = F.when(Http.isChunked(latin),
      Http.dechunkBytes(rawBody)).otherwise(rawBody)
    val coding = F.nullif(F.concat_ws(", ",
      Http.contentEncodingOf(latin),
      Http.residualTransferCoding(latin)), F.lit(""))
    val bodyBytes = F.when(coding.isNull, dechunked)
      .otherwise(Http.decodeContentCoding(dechunked, coding))
    val charset = F.coalesce(Http.bomCharsetOf(bodyBytes),
      Http.charsetOf(ct),
      HtmlExtract.metaCharset(F.decode(bodyBytes, "ISO-8859-1")),
      F.lit("utf-8"))
    val page = Http.decodeWith(Http.stripBom(bodyBytes), charset)
    val composed = df.select(
      Http.httpStatus(latin).as("status"),
      ct.as("content_type"),
      coding.as("content_encoding"),
      charset.as("charset"),
      HtmlExtract.robotsNoindex(page).as("noindex"),
      HtmlExtract.visibleText(page).as("text"))
    val native = df.select(Http.crawlTextFields(F.col("payload_bytes")).as("f"))
      .select(F.col("f").getField("status").as("status"),
        F.col("f").getField("content_type").as("content_type"),
        F.col("f").getField("content_encoding").as("content_encoding"),
        F.col("f").getField("charset").as("charset"),
        F.col("f").getField("noindex").as("noindex"),
        F.col("f").getField("text").as("text"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq.map(v => Option(v))).toSeq
    assert(rows(native) == rows(composed))
  }

  test("null passes through") {
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("p")
      .select(Http.httpBody(F.col("p")), Http.httpStatus(F.col("p")),
        Http.httpContentType(F.col("p"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
