package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Broadcast-backed centroid-table expressions for the IVF / IVF-PQ
  * family. The previous shape baked the full `C × dim` centroid table
  * into the plan as `typedLit`s — fine at the default C ≤ 16, but a
  * production coarse quantizer (C = 1024-4096, dim ≥ 256) is tens of
  * MB serialized into EVERY task closure of every stage. These
  * expressions carry only a [[Broadcast]] HANDLE in the plan; the
  * table ships once per executor via the block manager.
  *
  * Numeric contract: [[CentroidOps.sims]] replays
  * [[CosineUtil.cosine]]'s double-path op order exactly (dot/na/nb
  * accumulated in one index-ordered walk, `dot / (sqrt(na)·sqrt(nb))`),
  * so every IVF/IVF-PQ hash is unchanged — the argmax / top-nprobe /
  * tie logic stays in the existing column expressions, which consume
  * the sims array this produces. */
object CentroidOps {

  /** Cosine of `vec` against every centroid, in centroid order — the
    * replacement for C separate `cosine_similarity(v, typedLit)`
    * expressions. A null element or a length mismatch yields a null
    * sim for that centroid (CosineUtil parity). */
  def sims(vec: ArrayData, cents: Array[Array[Double]]): ArrayData = {
    val out = new Array[Any](cents.length)
    var k = 0
    while (k < cents.length) {
      out(k) = CentroidOps.cosineVs(vec, cents(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** [[CosineUtil.cosine]]'s double path against a plain double[]. */
  private def cosineVs(a: ArrayData, cent: Array[Double]): java.lang.Double = {
    val n = a.numElements()
    if (cent.length != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = cent(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)))
  }

  /** Centroid vector by cell id (0-based); null when out of range —
    * `element_at(typedLit(table), cell + 1)` parity. */
  def centroidAt(cell: Int, cents: Array[Array[Double]]): ArrayData =
    if (cell < 0 || cell >= cents.length) null
    else new GenericArrayData(cents(cell))
}

/** array<double> of per-centroid cosines — see [[CentroidOps.sims]]. */
case class CentroidSims(child: Expression, bc: Broadcast[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_sims"

  override def nullSafeEval(input: Any): Any =
    CentroidOps.sims(input.asInstanceOf[ArrayData], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centsBc", bc,
      classOf[Broadcast[Array[Array[Double]]]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CentroidOps.sims($c, (double[][]) $bcRef.value());")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidSims =
    copy(child = newChild)
}

/** Centroid vector for a cell id — see [[CentroidOps.centroidAt]]. */
case class CentroidVec(child: Expression, bc: Broadcast[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_vec"

  override def nullSafeEval(input: Any): Any =
    CentroidOps.centroidAt(input.asInstanceOf[Int], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centsBc", bc,
      classOf[Broadcast[Array[Array[Double]]]].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.CentroidOps.centroidAt($c, (double[][]) $bcRef.value());
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidVec =
    copy(child = newChild)
}
