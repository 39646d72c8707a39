package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types._

/** Product-quantization expressions (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011): split a
  * d-dim vector into `m` subvectors, quantize each against a per-subspace
  * codebook of `ksub` centroids, and score in the compressed domain by
  * table lookup (ADC — asymmetric distance computation).
  *
  * Scale shape: the codebook is KB-scale driver state baked into the
  * expressions (serialized with the plan, like a broadcast literal);
  * encoding is a map-only corpus pass emitting `m` small codes per row
  * (m bytes of payload instead of 4·d — a 100 TB fp32 corpus scans as
  * ~3 TB of codes); the per-pair ADC score is `m` array lookups + adds
  * instead of a d-dim dot product, codegen'd.
  *
  * All inputs are L2-normalized upstream, so the inner product the ADC
  * table approximates IS the cosine similarity.
  */
object PqUtil {

  /** codebook(sub)(code) = centroid subvector (length dsub). */
  type Codebook = Array[Array[Array[Double]]]

  def encode(vec: ArrayData, codebook: Codebook): ArrayData = {
    val m = codebook.length
    val dsub = codebook(0)(0).length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = vec.getDouble(s * dsub + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Query lookup table, flattened: lut(s·ksub + c) = ⟨q_s, centroid_{s,c}⟩. */
  def lut(vec: ArrayData, codebook: Codebook): ArrayData = {
    val m = codebook.length
    val ksub = codebook(0).length
    val dsub = codebook(0)(0).length
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val cent = codebook(s)(c)
        var dot = 0.0
        var i = 0
        while (i < dsub) { dot += vec.getDouble(s * dsub + i) * cent(i); i += 1 }
        out(s * ksub + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_s lut(s·ksub + code_s). */
  def adcScore(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += lut.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    sum
  }
}

/** PQ code array (array<int>, length m) for an array<double> vector. */
case class PqEncode(child: Expression, codebook: PqUtil.Codebook) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqUtil.encode(input.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.PqUtil.encode($c, $cb);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Flattened ADC lookup table (array<double>, length m·ksub) for a query. */
case class PqLut(child: Expression, codebook: PqUtil.Codebook) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any =
    PqUtil.lut(input.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.PqUtil.lut($c, $cb);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Compressed-domain score of (codes, lut) — the per-pair hot path. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqUtil.adcScore(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (c, l) => s"${ev.value} = graft.functions.PqUtil.adcScore($c, $l, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object Pq {
  def pq_encode(vec: Column, codebook: PqUtil.Codebook): Column =
    exprColumn(PqEncode(columnExpr(vec), codebook))
  def pq_lut(vec: Column, codebook: PqUtil.Codebook): Column =
    exprColumn(PqLut(columnExpr(vec), codebook))
  def pq_adc_score(codes: Column, lut: Column, ksub: Int): Column =
    exprColumn(PqAdcScore(columnExpr(codes), columnExpr(lut), ksub))
}
