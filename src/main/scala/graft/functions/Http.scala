package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

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
  def httpContentType(payload: Column): Column = {
    val head = F.when(sepIdx(payload) === 0, payload)
      .otherwise(payload.substr(F.lit(1), sepIdx(payload) - 1))
    F.when(isHttp(payload),
      F.nullif(F.trim(F.regexp_extract(head,
        "(?i)\\r\\ncontent-type:[ \\t]*([^\\r\\n]+)", 1)), F.lit("")))
  }
}
