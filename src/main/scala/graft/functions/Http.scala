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
    F.nullif(F.regexp_extract(payload, "^HTTP/[0-9.]+ ([0-9]{3})", 1),
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
      F.nullif(F.trim(F.regexp_extract(head,
        "(?i)\\r\\n" + name + ":[ \\t]*([^\\r\\n]+)", 1)), F.lit("")))
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
      "(?i);\\s*charset\\s*=\\s*\"?([A-Za-z0-9_-]+)", 1), F.lit("")))

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
    F.element_at(F.split(httpTransferEncoding(payload), ",\\s*"), -1) === "chunked"

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
      ",?\\s*chunked\\s*$", "")), F.lit(""))

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
