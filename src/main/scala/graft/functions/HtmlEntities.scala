package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Numeric HTML character references (`&#NN;` decimal, `&#xNN;` hex) as
  * a native codegen'd expression — real crawl HTML is full of
  * `&#8217;`/`&#x2019;` smart quotes and similar, which a
  * named-entity-only decode passes through as literal text into the
  * extracted training corpus. One pass over the string, no regex
  * chain, map-only at any corpus size.
  *
  * Decode contract (deterministic, engine-portable — the DuckDB oracle
  * replays it with a split-on-`&#` + regex + `chr` pipeline):
  *   - decimal form: `&#` + 1..7 digits + `;` (the maximal digit run
  *     must itself be ≤ 7 long — `&#00000039;` stays literal, exactly
  *     like the anchored-regex mirror where backtracking cannot help
  *     because the char after a shorter prefix is another digit);
  *   - hex form: `&#` + `x`/`X` + 1..6 hex digits + `;`, same maximal-
  *     run rule;
  *   - the code point must be a scalar value: 1 ≤ cp ≤ 0x10FFFF and
  *     not a surrogate (0xD800–0xDFFF). Anything else — `&#0;`,
  *     `&#xD800;`, `&#1114112;`, a missing semicolon — is left as
  *     literal text, never an error (crawl HTML is hostile input).
  * Named entities (`&amp;` …) are NOT handled here — they stay in
  * [[graft.pipeline.HtmlExtract.visibleText]]'s frozen replace chain,
  * which runs AFTER this decode so `&amp;#39;` correctly yields the
  * literal text `&#39;` (no double decode).
  *
  * (Reference analog: none — whylogs profiles text it is given; this
  * hardens the beyond-reference HTML-extraction family.)
  */
case class DecodeNumericEntities(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "decode_numeric_entities"

  override def nullSafeEval(input: Any): Any =
    HtmlEntitiesUtil.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntitiesUtil.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeNumericEntities =
    copy(child = newChild)
}

object HtmlEntitiesUtil {
  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** One-pass decode; returns the input object unchanged when no `&#`
    * occurs (the common case for clean text — zero allocation). */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf("&#") < 0) return s
    val len = str.length
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      var decoded = false
      if (str.charAt(i) == '&' && i + 1 < len && str.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < len && (str.charAt(j) == 'x' || str.charAt(j) == 'X')
        if (hex) j += 1
        val start = j
        val cap = if (hex) 6 else 7
        while (j < len && (if (hex) isHexDigit(str.charAt(j))
                           else str.charAt(j) >= '0' && str.charAt(j) <= '9')) j += 1
        // maximal run ≤ cap AND terminated by ';' — matches the
        // anchored {1,cap} regex in the oracle (backtracking inside a
        // longer digit run can never reach a ';')
        if (j > start && j - start <= cap && j < len && str.charAt(j) == ';') {
          val cp = Integer.parseInt(str.substring(start, j), if (hex) 16 else 10)
          if (cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
            sb.appendCodePoint(cp)
            i = j + 1
            decoded = true
          }
        }
      }
      if (!decoded) { sb.append(str.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}

object HtmlEntities {
  /** `decode_numeric_entities(col)` — see [[DecodeNumericEntities]]. */
  def decodeNumericEntities(c: Column): Column =
    exprColumn(DecodeNumericEntities(columnExpr(c)))
}
