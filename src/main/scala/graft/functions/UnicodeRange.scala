package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-codepoint-range character counts for one string value — the map
  * stage of the reference's UnicodeRangeMetric
  * (`core/metrics/unicode_range.py:77-113`): NFD-normalize + lowercase
  * (both optional), then for each named range count the characters whose
  * codepoint falls inside it; a character inside no range increments the
  * trailing UNKNOWN slot. A character may hit several overlapping ranges
  * (e.g. digits ⊂ basic-latin), exactly as the reference counts it.
  *
  * Output: array<int> of length `ranges.size + 1` (range order as given,
  * UNKNOWN last). The standard metric aggregates then profile each slot —
  * the MultiMetric composition happens in the aggregation layer.
  */
case class UnicodeRangeCounts(
    child: Expression,
    ranges: Seq[(Int, Int)],
    lowerCase: Boolean = true,
    normalize: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unicode_range_counts"

  private lazy val packed: Array[Long] =
    ranges.map { case (lo, hi) =>
      require(lo <= hi && lo >= 0 && hi <= 0x10FFFF, s"invalid codepoint range ($lo,$hi)")
      (lo.toLong << 32) | (hi.toLong & 0xffffffffL)
    }.toArray

  override def nullSafeEval(input: Any): Any =
    UnicodeRangeUtil.countRanges(
      input.asInstanceOf[UTF8String], packed, lowerCase, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ranges", packed, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeRangeUtil.countRanges($c, $ref, $lowerCase, $normalize)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeRangeCounts =
    copy(child = newChild)
}

object UnicodeRangeUtil {

  /** Reference default ranges (`core/configs.py:16-24`). */
  val DefaultRanges: Seq[(String, (Int, Int))] = Seq(
    "emoticon" -> (0x1F600, 0x1F64F),
    "control" -> (0x00, 0x1F),
    "digits" -> (0x30, 0x39),
    "latin-upper" -> (0x41, 0x5A),
    "latin-lower" -> (0x61, 0x7A),
    "basic-latin" -> (0x00, 0x7F),
    "extended-latin" -> (0x0080, 0x02AF))

  def countRanges(s: UTF8String, packed: Array[Long],
      lowerCase: Boolean, normalize: Boolean): ArrayData = {
    var str = s.toString
    if (normalize) str = Normalizer.normalize(str, Normalizer.Form.NFD)
    // Locale.ROOT: default-locale lowercasing (e.g. Turkish dotless i)
    // would make profiles machine-dependent
    if (lowerCase) str = str.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Int](packed.length + 1)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      var found = false
      var r = 0
      while (r < packed.length) {
        val lo = (packed(r) >>> 32).toInt
        val hi = (packed(r) & 0xffffffffL).toInt
        if (cp >= lo && cp <= hi) { counts(r) += 1; found = true }
        r += 1
      }
      if (!found) counts(packed.length) += 1
    }
    new GenericArrayData(counts)
  }
}

object UnicodeRanges {
  def unicode_range_counts(c: Column, ranges: Seq[(Int, Int)],
      lowerCase: Boolean = true, normalize: Boolean = true): Column =
    exprColumn(UnicodeRangeCounts(columnExpr(c), ranges, lowerCase, normalize))
}
