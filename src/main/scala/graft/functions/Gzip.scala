package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gzip compression/decompression expressions — the compressed
  * ingestion front door (Common Crawl ships `.warc.gz` with one gzip
  * MEMBER per record, concatenated; `.jsonl.gz` corpora are the same
  * shape). Both are map-only per-row codecs, so compressed ingestion
  * stays a pure scan.
  *
  * `gzip_decompress` reads MULTI-MEMBER streams (members concatenated
  * back to back decode as the concatenation of their contents — the
  * `java.util.zip.GZIPInputStream` contract, and exactly what a
  * per-record-gzipped WARC needs). Corrupt or truncated input yields
  * NULL, the lenient crawler-reality contract (a 100 TB crawl always
  * has damaged members; the caller filters NULLs and counts them) —
  * never an exception mid-scan. One inherited leniency: trailing bytes
  * after a complete member that do NOT start a new member header end
  * the stream silently (the valid prefix decodes) — damage INSIDE a
  * member still nulls.
  *
  * Determinism note: `gzip_compress` output bytes are
  * implementation-dependent (Deflater version/level), so queries never
  * hash raw compressed bytes — the oracle-checked surface is the
  * ROUND-TRIP (`decompress(compress(x)) = x`, certified hash-exact in
  * `warc_gz_roundtrip`) plus decode-of-external-bytes interop pinned
  * in GzipSpec against a fixture produced by a different gzip
  * implementation. */
object Gzip {

  def gzip_compress(text: Column): Column =
    exprColumn(GzipCompress(columnExpr(text)))

  def gzip_decompress(bytes: Column): Column =
    exprColumn(GzipDecompress(columnExpr(bytes)))

  /** [[gzip_compress]] over RAW BYTES (binary in, binary out) — for
    * payloads that are not valid UTF-8 strings (e.g. a WARC record
    * whose HTTP body is itself content-coded). */
  def gzip_compress_bytes(bytes: Column): Column =
    exprColumn(GzipCompressBinary(columnExpr(bytes)))

  /** [[gzip_decompress]] over RAW BYTES (binary in, binary out) —
    * required when the decompressed content's charset is not yet
    * known: an HTTP `Content-Encoding: gzip` body must decompress
    * BEFORE charset resolution decodes it (see
    * [[Http.decodeContentCoding]]). */
  def gzip_decompress_bytes(bytes: Column): Column =
    exprColumn(GzipDecompressBinary(columnExpr(bytes)))

  def compress(s: UTF8String): Array[Byte] = compressBytes(s.getBytes)

  def compressBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b)
    gz.close()
    bos.toByteArray
  }

  /** NULL (not an exception) on corrupt/truncated input. */
  def decompress(bytes: Array[Byte]): UTF8String = {
    val out = decompressBytes(bytes)
    if (out == null) null else UTF8String.fromBytes(out)
  }

  /** The byte-level decompression both variants share — NULL on
    * corrupt/truncated input, multi-member streams concatenate. */
  def decompressBytes(bytes: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        bos.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      bos.toByteArray
    } catch {
      case _: java.io.IOException => null
    }
  }

  /** DEFLATE content-coding decode (RFC 9110 §8.4.1.2: a zlib
    * container; many real servers ship RAW deflate instead — try zlib
    * first, fall back to raw). NULL on corrupt input, same lenient
    * contract as [[decompressBytes]]. */
  def inflateBytes(bytes: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(bytes)
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            return null // truncated / preset-dictionary stream
          bos.write(buf, 0, n)
        }
        bos.toByteArray
      } catch {
        case _: java.util.zip.DataFormatException => null
      } finally inf.end()
    }
    val zlib = run(nowrap = false)
    if (zlib != null) zlib else run(nowrap = true)
  }
}

/** Gzip bytes of a string's UTF-8 form (one member). */
case class GzipCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_compress"

  override def nullSafeEval(input: Any): Any =
    Gzip.compress(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Gzip.compress($c);")

  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
}

/** Gzip bytes of raw input bytes (one member). */
case class GzipCompressBinary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_compress_bytes"

  override def nullSafeEval(input: Any): Any =
    Gzip.compressBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Gzip.compressBytes($c);")

  override protected def withNewChildInternal(newChild: Expression): GzipCompressBinary =
    copy(child = newChild)
}

/** Decompressed string of a (possibly multi-member) gzip byte stream;
  * NULL on corrupt input. */
case class GzipDecompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_decompress"

  override def nullSafeEval(input: Any): Any =
    Gzip.decompress(input.asInstanceOf[Array[Byte]])

  // decompress returns null on corrupt input, so codegen must propagate
  // it into isNull — otherwise the downstream UnsafeRow writer NPEs on a
  // null value flagged non-null (interpreted eval masks this; a
  // parquet-backed codegen scan does not).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"""${ev.value} = graft.functions.Gzip.decompress($c);
              |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GzipDecompress =
    copy(child = newChild)
}

/** Decompressed BYTES of a (possibly multi-member) gzip byte stream;
  * NULL on corrupt input — see [[Gzip.gzip_decompress_bytes]]. */
case class GzipDecompressBinary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_decompress_bytes"

  override def nullSafeEval(input: Any): Any =
    Gzip.decompressBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"""${ev.value} = graft.functions.Gzip.decompressBytes($c);
              |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GzipDecompressBinary =
    copy(child = newChild)
}
