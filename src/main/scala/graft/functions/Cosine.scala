package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass cosine similarity between two numeric array columns.
  *
  * Replaces the `zip_with` + `aggregate` HOF formulation: higher-order
  * functions evaluate an interpreted lambda per element (and the three
  * folds walk the arrays three times), which measured ~2 µs per pair at
  * dim=64 — 26 s for the 12.5M-pair sf0.1 near-dup query. This expression
  * walks both arrays once with primitive reads and participates in
  * whole-stage codegen via a static call (same rationale as
  * [[HyperplaneBands]] / [[MinHashSignature]]).
  *
  * Numeric semantics are bit-identical to the HOF version (oracle parity
  * depends on it — see the `dedup_embedding` DuckDB oracle):
  *   - double arrays: dot = fold-left of Σ aᵢ·bᵢ in double from 0.0,
  *     norms likewise — matches DuckDB's `list_dot_product` on DOUBLE[].
  *   - float arrays: each product is computed in FLOAT precision (rounded
  *     to float, as `zip_with`'s `x * y` does) then widened into a double
  *     accumulator.
  *   - NULL array, NULL element, or length mismatch → NULL (zip_with pads
  *     the shorter side with NULL, poisoning the fold).
  *   - empty arrays → 0.0/0.0 = NaN, as before.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  // resolved lazily — children may be unresolved while the analyzer copies
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aF = isFloat(left)
    val bF = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosSim")
      s"""
         |java.lang.Double $tmp = graft.functions.CosineUtil.cosine($a, $b, $aF, $bF);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineUtil {

  /** Cosine similarity, or null for length mismatch / null elements.
    * Float inputs keep per-product float rounding (HOF parity). */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    val bothFloat = aFloat && bFloat
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (bothFloat) {
        val x = a.getFloat(i)
        val y = b.getFloat(i)
        dot += (x * y).toDouble
        na += (x * x).toDouble
        nb += (y * y).toDouble
      } else {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        na += (if (aFloat) (a.getFloat(i) * a.getFloat(i)).toDouble else x * x)
        nb += (if (bFloat) (b.getFloat(i) * b.getFloat(i)).toDouble else y * y)
      }
      i += 1
    }
    java.lang.Double.valueOf(dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)))
  }
}
