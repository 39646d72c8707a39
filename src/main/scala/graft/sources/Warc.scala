package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container format)
  * record parsing: the ingestion front door of a web-scale training
  * pipeline (WARC → response payloads → HTML extraction → quality →
  * dedup). One native expression splits a WARC file's bytes into
  * records; everything downstream is the existing pipeline.
  *
  * Format (WARC/1.0): each record is a version line `WARC/1.0\r\n`,
  * header lines `Name: value\r\n`, a blank line `\r\n`, then EXACTLY
  * `Content-Length` BYTES of payload, then the `\r\n\r\n` record
  * terminator. Payload slicing MUST be driven by Content-Length, not
  * by scanning for the next version line — payloads legitimately
  * contain `WARC/1.0` (a crawler archiving a page about WARC), and
  * multi-byte characters make byte length ≠ character length. This
  * parser walks the raw UTF-8 bytes and slices payloads byte-exactly.
  *
  * Malformed tails are handled leniently, the crawler-reality contract:
  * a record whose header block never terminates, whose Content-Length
  * is missing/unparseable, or whose declared payload overruns the file
  * is DROPPED (with everything after it), never thrown — a 100 TB
  * crawl always contains truncated final records.
  *
  * Scale shape: map-only (one expression per file/chunk row), so WARC
  * ingestion is a pure scan — read whole files as binary (Spark's
  * `binaryFile` source) or pre-chunked strings, explode the record
  * array, and the shuffle (if any) belongs to the downstream operator.
  *
  * (Reference analog: none — whylogs reads tabular inputs only; this
  * extends the sources family for the LLM-pipeline arc.)
  */
object Warc {

  // no payload_bytes here, deliberately: duplicating the payload in
  // the struct doubles every consumer's Tungsten row size pre-explode.
  // The charset-correct byte slice lives on the FILE path
  // ([[WarcFileRecord.payload_bytes]]), which is where non-UTF-8 pages
  // actually arrive; this expression's input is an in-memory STRING.
  val recordType: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Parse a WARC file's content (string; bytes are its UTF-8 form)
    * into an array of `(warc_type, record_id, target_uri,
    * content_length, payload)` structs. NULL input → NULL. */
  def warc_records(content: Column): Column =
    exprColumn(WarcRecords(columnExpr(content)))

  private val Version = "WARC/1.0\r\n".getBytes("US-ASCII")
  private val HdrEnd = "\r\n\r\n".getBytes("US-ASCII")

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** The parse walk, shared by eval and codegen. */
  def parse(content: UTF8String): ArrayData = {
    val bytes = content.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var pos = 0
    var ok = true
    while (ok && pos + Version.length <= bytes.length) {
      // record must start with the version line; anything else ends the walk
      var v = 0
      while (v < Version.length && bytes(pos + v) == Version(v)) v += 1
      if (v != Version.length) ok = false
      else {
        val hdrEnd = indexOf(bytes, HdrEnd, pos + Version.length)
        if (hdrEnd < 0) ok = false
        else {
          val headers = new String(bytes, pos + Version.length,
            hdrEnd - pos - Version.length, "UTF-8")
          var warcType: String = null
          var recordId: String = null
          var targetUri: String = null
          var contentLength = -1L
          headers.split("\r\n").foreach { line =>
            val c = line.indexOf(':')
            if (c > 0) {
              val name = line.substring(0, c).trim
              val value = line.substring(c + 1).trim
              // header names are case-insensitive per the spec
              name.toLowerCase(java.util.Locale.ROOT) match {
                case "warc-type" => warcType = value
                case "warc-record-id" => recordId = value
                case "warc-target-uri" => targetUri = value
                case "content-length" =>
                  try contentLength = java.lang.Long.parseLong(value)
                  catch { case _: NumberFormatException => contentLength = -1L }
                case _ => ()
              }
            }
          }
          val payloadStart = hdrEnd + HdrEnd.length
          if (contentLength < 0 ||
              payloadStart + contentLength > bytes.length) ok = false
          else {
            val payload = new String(bytes, payloadStart,
              contentLength.toInt, "UTF-8")
            out += InternalRow(
              if (warcType == null) null else UTF8String.fromString(warcType),
              if (recordId == null) null else UTF8String.fromString(recordId),
              if (targetUri == null) null else UTF8String.fromString(targetUri),
              contentLength,
              UTF8String.fromString(payload))
            // the record must be followed by the \r\n\r\n terminator (or
            // EOF — a truncated tail keeps this record). A record whose
            // terminator bytes are WRONG means the walk is desynced
            // (e.g. an under-declared Content-Length): keep this record,
            // STOP the walk — explicit leniency, never a silent resync
            // that could mis-slice every record after the damage.
            val termStart = payloadStart + contentLength.toInt
            var t = 0
            while (t < HdrEnd.length && termStart + t < bytes.length &&
              bytes(termStart + t) == HdrEnd(t)) t += 1
            if (t < HdrEnd.length && termStart + t < bytes.length) ok = false
            else pos = termStart + HdrEnd.length
          }
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** array<struct> of parsed WARC records — see [[Warc]]. */
case class WarcRecords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(Warc.recordType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_records"

  override def nullSafeEval(input: Any): Any =
    Warc.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.sources.Warc.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}
