package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP response header/body split — the step between the WARC front
  * door and HTML extraction. A real Common Crawl `response` record's
  * payload is a FULL HTTP response (`HTTP/1.1 200 OK\r\n` + headers +
  * `\r\n\r\n` + body); feeding it straight to text extraction leaks
  * header lines into the corpus. These are pure built-in string
  * expressions (startswith/locate/substr/regexp_extract — codegen'd,
  * map-only, zero shuffle) with identical DuckDB spellings, so the
  * split is oracle-checked end to end (`warc_http_extract`).
  *
  * Leniency contract (crawler reality): a payload that does not start
  * with `HTTP/` is treated as a BARE body (returned unchanged, status
  * and headers NULL) — so pre-split corpora and non-HTTP records flow
  * through the same pipeline unchanged. An HTTP payload with no blank
  * line is all headers: body is the empty string.
  *
  * (Reference analog: none — whylogs reads tabular inputs; this is the
  * web-ingestion arc between [[graft.sources.Warc]] and
  * [[graft.pipeline.HtmlExtract]].)
  */
object Http {

  private val Sep = "\r\n\r\n"

  // the regex spellings, shared with [[CrawlTextFields]]'s one-pass
  // twin BY CONSTRUCTION (a future grammar change cannot
  // desynchronize the native fast path from this composable API)
  private[graft] val statusPattern = "^HTTP/[0-9.]+ ([0-9]{3})"
  private[graft] def headerPattern(name: String): String =
    "(?i)\\r\\n" + name + ":[ \\t]*([^\\r\\n]+)"
  private[graft] val charsetParamPattern =
    "(?i);\\s*charset\\s*=\\s*\"?([A-Za-z0-9_-]+)"
  private[graft] val residualChunkedPattern = ",?\\s*chunked\\s*$"
  private[graft] val teListSplitPattern = ",\\s*"

  private def isHttp(payload: Column): Column = payload.startsWith("HTTP/")

  /** 1-based index of the header/body separator; 0 when absent. */
  private def sepIdx(payload: Column): Column = F.locate(Sep, payload)

  /** The response body: bytes after the first `\r\n\r\n` of an HTTP
    * payload; a non-HTTP payload IS the body; headers-only → "".
    * NULL → NULL. */
  def httpBody(payload: Column): Column =
    F.when(!isHttp(payload), payload)
      .when(sepIdx(payload) === 0, F.lit(""))
      .otherwise(payload.substr(sepIdx(payload) + 4, F.length(payload)))

  /** The status code (e.g. 200) from the status line; NULL for
    * non-HTTP payloads or an unparseable status line. */
  def httpStatus(payload: Column): Column =
    F.nullif(F.regexp_extract(payload, statusPattern, 1),
      F.lit("")).cast("int")

  /** The Content-Type header value (case-insensitive name match,
    * trimmed), from the HEADER BLOCK only — never the body. NULL when
    * absent or non-HTTP. */
  def httpContentType(payload: Column): Column =
    headerValue(payload, "content-type")

  /** The Transfer-Encoding header value, lowercased+trimmed (its
    * grammar is case-insensitive) — `chunked` is the one that matters:
    * a WARC response stores the raw capture, so a chunked response's
    * body is still chunk-framed and must be [[dechunk]]ed before any
    * text processing. NULL when absent or non-HTTP. */
  def httpTransferEncoding(payload: Column): Column =
    F.lower(headerValue(payload, "transfer-encoding"))

  private def headerValue(payload: Column, name: String): Column = {
    val head = F.when(sepIdx(payload) === 0, payload)
      .otherwise(payload.substr(F.lit(1), sepIdx(payload) - 1))
    F.when(isHttp(payload),
      F.nullif(F.trim(F.regexp_extract(head, headerPattern(name), 1)),
        F.lit("")))
  }

  /** Decode an HTTP/1.1 CHUNKED body (RFC 9112 §7.1): size-hex line
    * (chunk extensions after `;` ignored) + CRLF + that many BYTES +
    * CRLF, repeated, terminated by a 0-size chunk (trailers ignored).
    * Byte-exact (multi-byte characters never split a count), map-only,
    * codegen'd. Malformed framing → NULL, never an exception — the
    * same crawler-reality contract as [[Gzip]] (a partial reassembly
    * is not trustworthy text, so the caller filters NULLs). */
  def dechunk(body: Column): Column =
    exprColumn(HttpDechunk(columnExpr(body)))

  /** The charset parameter of a Content-Type value (e.g.
    * `text/html; charset=UTF-8` → `utf-8`), lowercased; NULL when
    * absent. The header-side half of charset resolution — a real
    * decoder prefers this, then the page's
    * [[graft.pipeline.HtmlExtract.metaCharset]], then a sniff. */
  def charsetOf(contentType: Column): Column =
    F.lower(F.nullif(F.regexp_extract(contentType,
      charsetParamPattern, 1), F.lit("")))

  /** [[dechunk]] over RAW BYTES (binary in, binary out) — required
    * when the body's charset is not yet known: chunk sizes count
    * ORIGINAL bytes, so reassembly must precede character decoding. */
  def dechunkBytes(body: Column): Column =
    exprColumn(HttpDechunkBinary(columnExpr(body)))

  /** TRUE when the response's FINAL transfer coding is `chunked` —
    * RFC 9112 requires chunked to be applied last, so a multi-coding
    * value like `gzip, chunked` is still chunk-framed OUTERMOST and
    * must be de-framed first (equality against the whole value would
    * miss it and leak hex size lines into the text). */
  def isChunked(payload: Column): Column =
    F.element_at(F.split(httpTransferEncoding(payload),
      teListSplitPattern), -1) === "chunked"

  /** The body ready for text processing: [[dechunk]]ed when the
    * response's final transfer coding is chunked, raw otherwise. */
  def httpDecodedBody(payload: Column): Column = {
    val raw = httpBody(payload)
    F.when(isChunked(payload), dechunk(raw)).otherwise(raw)
  }

  /** The Content-Encoding header value, lowercased+trimmed (its
    * grammar is case-insensitive) — a WARC stores the capture RAW, so
    * a `Content-Encoding: gzip` response's body is still gzip bytes
    * and must decompress before any text processing (standard WARC
    * readers decode this layer; skipping it feeds gzip bytes into
    * extraction as silent garbage). NULL when absent or non-HTTP. */
  def contentEncodingOf(payload: Column): Column =
    F.lower(headerValue(payload, "content-encoding"))

  /** Transfer codings still applied AFTER the outer chunked framing is
    * removed: the Transfer-Encoding list minus its trailing `chunked`
    * (RFC 9112 requires chunked last, so `gzip, chunked` leaves `gzip`
    * applied to the reassembled body). NULL when nothing residual. */
  def residualTransferCoding(payload: Column): Column =
    F.nullif(F.trim(F.regexp_replace(httpTransferEncoding(payload),
      residualChunkedPattern, "")), F.lit(""))

  /** Decode a CONTENT/TRANSFER CODING list over raw body bytes:
    * codings apply right-to-left (the sender applied them left-to-
    * right), `identity` is a no-op, `gzip`/`x-gzip` and `deflate`
    * decompress ([[Gzip]]), and any UNKNOWN coding (`br`, `zstd`,
    * `compress`) yields NULL — the established lenient contract: a
    * body we cannot decode is NULL text the caller filters, never
    * silent garbage and never an exception. */
  def decodeContentCoding(bytes: Column, codings: Column): Column =
    exprColumn(DecodeContentCoding(columnExpr(bytes), columnExpr(codings)))

  /** Decode bytes with a PER-ROW charset name (java.nio resolution,
    * aliases included; malformed/unmappable sequences become U+FFFD —
    * the lenient crawl contract). NULL bytes, NULL charset, or an
    * unknown charset name → NULL. */
  def decodeWith(bytes: Column, charset: Column): Column =
    exprColumn(DecodeWithCharset(columnExpr(bytes), columnExpr(charset)))

  /** ALL payload-derived crawl columns in ONE imperative pass —
    * `struct<status, content_type, content_encoding, charset, noindex,
    * text>`. Semantically identical to composing the individual
    * column functions ([[httpStatus]]/[[httpContentType]]/
    * [[decodeContentCoding]]/[[bomCharsetOf]]/
    * [[graft.pipeline.HtmlExtract.robotsNoindex]]/
    * [[graft.pipeline.HtmlExtract.visibleText]] — HttpSpec pins
    * field-for-field equivalence on every envelope shape), but ~100×
    * cheaper: the composed COLUMN tree duplicates the latin-1 decode /
    * dechunk / gunzip chain into every conditional branch (each
    * `nullif`/`when` copies its subtree, and Spark's subexpression
    * elimination cannot reach inside conditionals), so the `noindex`
    * column alone re-derived the page ~40×; here each stage runs
    * exactly once per record, with the header/meta regexes compiled
    * once per JVM. This is [[graft.sources.WarcFiles.readCrawlText]]'s
    * evaluation path; the small column functions remain the
    * composable/oracle-transparent API. */
  def crawlTextFields(payloadBytes: Column): Column =
    exprColumn(CrawlTextFields(columnExpr(payloadBytes)))

  private val bomUtf8 = F.lit(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
  private val bomUtf16be = F.lit(Array(0xFE.toByte, 0xFF.toByte))
  private val bomUtf16le = F.lit(Array(0xFF.toByte, 0xFE.toByte))

  /** The BOM-declared charset of body bytes (`utf-8` / `utf-16be` /
    * `utf-16le`), NULL when no BOM. Per the WHATWG encoding sniff a
    * BOM OUTRANKS every other declaration, header included — a UTF-16
    * page's meta tag cannot even be read before decoding, so this is
    * the only signal that can catch it. Pure codegen'd byte slices. */
  def bomCharsetOf(bytes: Column): Column =
    F.when(F.substring(bytes, 1, 3) === bomUtf8, F.lit("utf-8"))
      .when(F.substring(bytes, 1, 2) === bomUtf16be, F.lit("utf-16be"))
      .when(F.substring(bytes, 1, 2) === bomUtf16le, F.lit("utf-16le"))

  /** Body bytes with any leading BOM removed — java.nio decoders for
    * explicit-endian charsets (and utf-8) keep the BOM as a content
    * char (U+FEFF), which would leak into extracted text. */
  def stripBom(bytes: Column): Column =
    F.when(F.substring(bytes, 1, 3) === bomUtf8,
        F.substring(bytes, 4, Int.MaxValue))
      .when(F.substring(bytes, 1, 2) === bomUtf16be ||
        F.substring(bytes, 1, 2) === bomUtf16le,
        F.substring(bytes, 3, Int.MaxValue))
      .otherwise(bytes)
}

/** One-pass crawl-field extractor — see [[Http.crawlTextFields]]. */
case class CrawlTextFields(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CrawlTextFields.schema
  override def nullable: Boolean = true
  override def prettyName: String = "crawl_text_fields"

  override def nullSafeEval(input: Any): Any =
    CrawlTextFields.extract(input.asInstanceOf[Array[Byte]])

  // The companion method must NOT be named `eval`: scalac suppresses a
  // companion-object static forwarder when the class has a same-named
  // member (Expression.eval(InternalRow) here), so generated Java
  // calling `CrawlTextFields.eval(bytes)` failed to COMPILE and every
  // stage fusing this expression silently fell back to interpreted
  // execution (r20 finding — the CodeGenerator ERROR lines in every
  // crawl-query run). `extract` has a real static forwarder.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.CrawlTextFields.extract($c);")

  override protected def withNewChildInternal(newChild: Expression): CrawlTextFields =
    copy(child = newChild)
}

object CrawlTextFields {
  import java.util.regex.Pattern

  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("status",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("content_type", StringType),
      org.apache.spark.sql.types.StructField("content_encoding", StringType),
      org.apache.spark.sql.types.StructField("charset", StringType),
      org.apache.spark.sql.types.StructField("noindex",
        org.apache.spark.sql.types.BooleanType, nullable = false),
      org.apache.spark.sql.types.StructField("text", StringType)))

  // every pattern is compiled ONCE per JVM from the SAME string
  // constants the column functions use — shared by construction, so
  // the two spellings cannot drift (HttpSpec additionally pins
  // field-for-field equivalence)
  private val pStatus = Pattern.compile(Http.statusPattern)
  private val pContentType = Pattern.compile(Http.headerPattern("content-type"))
  private val pTransferEnc =
    Pattern.compile(Http.headerPattern("transfer-encoding"))
  private val pContentEnc =
    Pattern.compile(Http.headerPattern("content-encoding"))
  private val pResidual = Pattern.compile(Http.residualChunkedPattern)
  private val pHeaderCharset = Pattern.compile(Http.charsetParamPattern)
  private val pMetaCharset =
    graft.pipeline.HtmlExtract.metaCharsetPatterns.map(Pattern.compile)
  private val pMetaRobots =
    graft.pipeline.HtmlExtract.metaRobotsPatterns.map(Pattern.compile)
  private val pTags = Pattern.compile(graft.pipeline.HtmlExtract.tagPattern)
  private val pWs = Pattern.compile(graft.pipeline.HtmlExtract.wsPattern)
  // String.split(regex) recompiles per call — precompile the two
  // per-row list splitters
  private val pTeList = Pattern.compile(Http.teListSplitPattern)
  private val pDirList =
    Pattern.compile(graft.pipeline.HtmlExtract.directiveSplitPattern)

  /** regexp_extract twin: group 1 at the first find, "" on no match. */
  private def rx(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** Spark `trim` twin: spaces (0x20) only — NOT java's <=0x20 trim. */
  private def trimSp(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private def nullIfEmpty(s: String): String =
    if (s == null || s.isEmpty) null else s

  /** headerValue twin over the pre-split head block; null when absent. */
  private def header(p: Pattern, head: String): String =
    nullIfEmpty(trimSp(rx(p, head)))

  def extract(payload: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val latin = new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1)
    val isHttp = latin.startsWith("HTTP/")
    val sep = latin.indexOf("\r\n\r\n")

    // status: anchored find over the full payload; "" -> null
    val statusStr = if (isHttp) nullIfEmpty(rx(pStatus, latin)) else null
    val status: Any =
      if (statusStr == null) null else Integer.valueOf(statusStr.toInt)

    // header block (never the body); non-HTTP payloads have no headers
    val head = if (!isHttp) null else if (sep < 0) latin else latin.substring(0, sep)
    val ct = if (head == null) null else header(pContentType, head)
    val te = if (head == null) null
      else { val v = header(pTransferEnc, head)
        if (v == null) null else v.toLowerCase(java.util.Locale.ROOT) }
    val ce = if (head == null) null
      else { val v = header(pContentEnc, head)
        if (v == null) null else v.toLowerCase(java.util.Locale.ROOT) }

    // body BYTES: latin-1 is a char<->byte bijection, so slicing the
    // raw payload equals encode(substr(latin), latin-1)
    val raw: Array[Byte] =
      if (!isHttp) payload
      else if (sep < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)

    // outer chunked framing first (final coding per RFC 9112)
    val chunked = te != null && pTeList.split(te, -1).last == "chunked"
    val dechunked = if (chunked) HttpDechunk.decodeBytes(raw) else raw

    // residual codings: content-encoding, then transfer minus chunked
    val residual =
      if (te == null) null
      else nullIfEmpty(trimSp(pResidual.matcher(te).replaceAll("")))
    val coding =
      if (ce == null && residual == null) null
      else if (ce == null) residual
      else if (residual == null) ce
      else ce + ", " + residual
    val body =
      if (coding == null) dechunked
      else if (dechunked == null) null
      else DecodeContentCoding.decode(dechunked, UTF8String.fromString(coding))

    // charset: BOM > header param > meta declaration > utf-8 default
    val bom =
      if (body == null) null
      else if (body.length >= 3 && body(0) == 0xEF.toByte &&
        body(1) == 0xBB.toByte && body(2) == 0xBF.toByte) "utf-8"
      else if (body.length >= 2 && body(0) == 0xFE.toByte &&
        body(1) == 0xFF.toByte) "utf-16be"
      else if (body.length >= 2 && body(0) == 0xFF.toByte &&
        body(1) == 0xFE.toByte) "utf-16le"
      else null
    val headerCs =
      if (ct == null) null
      else { val v = nullIfEmpty(rx(pHeaderCharset, ct))
        if (v == null) null else v.toLowerCase(java.util.Locale.ROOT) }
    val metaCs =
      if (body == null || bom != null || headerCs != null) null
      else {
        val bodyLatin =
          new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
        var found: String = null
        val it = pMetaCharset.iterator
        while (found == null && it.hasNext)
          found = nullIfEmpty(rx(it.next(), bodyLatin))
        if (found == null) null else found.toLowerCase(java.util.Locale.ROOT)
      }
    val charset =
      if (bom != null) bom
      else if (headerCs != null) headerCs
      else if (metaCs != null) metaCs
      else "utf-8"

    val sansBom =
      if (body == null) null
      else if (bom == "utf-8") java.util.Arrays.copyOfRange(body, 3, body.length)
      else if (bom != null) java.util.Arrays.copyOfRange(body, 2, body.length)
      else body
    val pageU =
      if (sansBom == null) null
      else DecodeWithCharset.decode(sansBom, UTF8String.fromString(charset))
    val page = if (pageU == null) null else pageU.toString

    // meta-robots noindex/none; null page -> false
    val noindex =
      if (page == null) false
      else {
        var dirs: String = null
        val it = pMetaRobots.iterator
        while (dirs == null && it.hasNext) dirs = nullIfEmpty(rx(it.next(), page))
        dirs != null && pDirList
          .split(dirs.toLowerCase(java.util.Locale.ROOT), -1)
          .exists(d => d == "noindex" || d == "none")
      }

    // visible text: tags -> numeric entities -> named set -> collapse
    val text: UTF8String =
      if (page == null) null
      else {
        val stripped = pTags.matcher(page).replaceAll(" ")
        val numeric = graft.functions.HtmlEntitiesUtil
          .decode(UTF8String.fromString(stripped)).toString
        val named = graft.pipeline.HtmlExtract.entities
          .foldLeft(numeric) { case (acc, (e, ch)) => acc.replace(e, ch) }
        UTF8String.fromString(trimSp(pWs.matcher(named).replaceAll(" ")))
      }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](status,
        if (ct == null) null else UTF8String.fromString(ct),
        if (coding == null) null else UTF8String.fromString(coding),
        UTF8String.fromString(charset),
        noindex,
        text))
  }
}

/** Content/transfer-coding decoder — see [[Http.decodeContentCoding]]. */
case class DecodeContentCoding(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_content_coding"

  override def nullSafeEval(bytes: Any, codings: Any): Any =
    DecodeContentCoding.decode(bytes.asInstanceOf[Array[Byte]],
      codings.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"""${ev.value} = graft.functions.DecodeContentCoding.decode($b, $c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeContentCoding =
    copy(left = newLeft, right = newRight)
}

object DecodeContentCoding {

  /** Apply the comma-separated coding list right-to-left; NULL on an
    * unknown coding or corrupt compressed data. */
  def decode(bytes: Array[Byte], codings: UTF8String): Array[Byte] = {
    var out = bytes
    val names = codings.toString.split(",")
    var i = names.length - 1
    while (i >= 0) {
      val c = names(i).trim.toLowerCase(java.util.Locale.ROOT)
      c match {
        case "" | "identity" => () // no-op coding
        case "gzip" | "x-gzip" => out = Gzip.decompressBytes(out)
        case "deflate" => out = Gzip.inflateBytes(out)
        case _ => return null // br / zstd / compress / garbage
      }
      if (out == null) return null
      i -= 1
    }
    out
  }
}

/** Per-row-charset byte decoder — see [[Http.decodeWith]]. */
case class DecodeWithCharset(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_with"

  override def nullSafeEval(bytes: Any, cs: Any): Any =
    DecodeWithCharset.decode(bytes.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"""${ev.value} = graft.functions.DecodeWithCharset.decode($b, $c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeWithCharset =
    copy(left = newLeft, right = newRight)
}

object DecodeWithCharset {
  def decode(bytes: Array[Byte], cs: UTF8String): UTF8String =
    try {
      val decoder = java.nio.charset.Charset.forName(cs.toString.trim)
        .newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      UTF8String.fromString(
        decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: Exception => null // unknown/illegal charset name
    }
}

/** Chunked-transfer-encoding decoder — see [[Http.dechunk]]. */
case class HttpDechunk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "http_dechunk"

  override def nullSafeEval(input: Any): Any =
    HttpDechunk.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"""${ev.value} = graft.functions.HttpDechunk.decode($c);
              |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HttpDechunk =
    copy(child = newChild)
}

/** Chunked decoder over RAW BYTES — the charset-correct path: chunk
  * sizes count ORIGINAL bytes, so a non-UTF-8 body must be dechunked
  * BEFORE any character decoding (see [[Http.dechunkBytes]]). */
case class HttpDechunkBinary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "http_dechunk_bytes"

  override def nullSafeEval(input: Any): Any =
    HttpDechunk.decodeBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"""${ev.value} = graft.functions.HttpDechunk.decodeBytes($c);
              |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HttpDechunkBinary =
    copy(child = newChild)
}

object HttpDechunk {

  /** NULL (not an exception) on malformed framing. */
  def decode(body: UTF8String): UTF8String = {
    val out = decodeBytes(body.getBytes)
    if (out == null) null else UTF8String.fromBytes(out)
  }

  /** The byte-level walk both variants share. */
  def decodeBytes(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var pos = 0
    while (true) {
      // chunk-size line: hex digits, optional ;extensions, then CRLF
      var eol = pos
      while (eol + 1 < b.length && !(b(eol) == '\r' && b(eol + 1) == '\n')) eol += 1
      if (eol + 1 >= b.length) return null // no CRLF-terminated size line
      var lineEnd = eol
      var semi = pos
      while (semi < lineEnd && b(semi) != ';') semi += 1
      lineEnd = semi
      if (lineEnd == pos) return null // empty size field
      var size = 0L
      var i = pos
      while (i < lineEnd) {
        val c = b(i)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else return null
        size = size * 16 + d
        if (size > Int.MaxValue) return null
        i += 1
      }
      pos = eol + 2
      if (size == 0) // final chunk; trailers (if any) are ignored
        return out.toByteArray
      if (pos + size + 2 > b.length) return null // data overruns the body
      out.write(b, pos, size.toInt)
      pos += size.toInt
      if (b(pos) != '\r' || b(pos + 1) != '\n') return null
      pos += 2
    }
    null // unreachable
  }
}
