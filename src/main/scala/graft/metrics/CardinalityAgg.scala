package graft.metrics

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object CardinalityAgg {
  val dataTypeStatic: StructType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("lower", DoubleType, nullable = false),
    StructField("upper", DoubleType, nullable = false),
    StructField("hll", BinaryType, nullable = false)))
}

/** Cardinality metric: HLL sketch with upper/lower bounds at `numStdDev`
  * standard deviations, matching the reference's CardinalityMetric
  * (whylogs `python/whylogs/core/metrics/metrics.py:535-631`, lg_k=12).
  *
  * A native aggregate (rather than `approx_count_distinct`) because the
  * reference exposes the error bounds and the serialized sketch for
  * cross-profile merge; datasketches HLL images are language-portable.
  * Buffer is a `Union` so partial/final merge is the sketch-native union.
  */
case class CardinalityAgg(
    child: Expression,
    lgK: Int = 12,
    numStdDev: Int = 1,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_cardinality"
  override def nullable: Boolean = false
  override val dataType: DataType = CardinalityAgg.dataTypeStatic

  override def createAggregationBuffer(): Union = new Union(lgK)

  override def update(buf: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case s: UTF8String        => buf.update(s.getBytes)
      case l: java.lang.Long    => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case sh: java.lang.Short  => buf.update(sh.longValue())
      case b: java.lang.Byte    => buf.update(b.longValue())
      case d: java.lang.Double  => buf.update(d.doubleValue())
      case f: java.lang.Float   => buf.update(f.doubleValue())
      case b: java.lang.Boolean => buf.update(if (b) 1L else 0L)
      case d: Decimal           => buf.update(d.toDouble)
      case bytes: Array[Byte]   => buf.update(bytes)
      case other                => buf.update(other.toString)
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.update(b.getResult(TgtHllType.HLL_8))
    a
  }

  override def eval(buf: Union): Any = {
    val sk = buf.getResult(TgtHllType.HLL_4)
    InternalRow(sk.getEstimate, sk.getLowerBound(numStdDev), sk.getUpperBound(numStdDev),
      sk.toCompactByteArray)
  }

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult(TgtHllType.HLL_8).toUpdatableByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = new Union(lgK)
    u.update(HllSketch.heapify(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CardinalityAgg =
    copy(child = newChild)
}
