package graft.metrics

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object FrequentItemsAgg {
  val dataTypeStatic: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("estimate", LongType, nullable = false),
      StructField("lower", LongType, nullable = false),
      StructField("upper", LongType, nullable = false))), containsNull = false), nullable = false),
    StructField("sketch", BinaryType, nullable = false)))

  /** Reference truncates tracked items to 128 chars
    * (`core/metrics/metrics.py:464`, `max_frequent_item_size`). */
  val MaxItemLength = 128
}

/** Frequent-items metric: datasketches frequent-strings sketch
  * (lg_max_k=7 default), matching the reference's FrequentItemsMetric
  * (whylogs `python/whylogs/core/metrics/metrics.py:444-532`).
  *
  * Output is the top-`limit` items under NO_FALSE_NEGATIVES, sorted by
  * (estimate desc, value asc) for deterministic results. When the column's
  * distinct count fits the sketch map the estimates are exact counts.
  */
case class FrequentItemsAgg(
    child: Expression,
    lgMaxK: Int = 7,
    limit: Int = 32,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_frequent_items"
  override def nullable: Boolean = false
  override val dataType: DataType = FrequentItemsAgg.dataTypeStatic

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](1 << lgMaxK)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String        => u.toString
        case b: java.lang.Boolean => if (b) "True" else "False" // reference stringification (`metrics.py:472-485`)
        case other                => other.toString
      }
      buf.update(if (s.length > FrequentItemsAgg.MaxItemLength)
        s.substring(0, FrequentItemsAgg.MaxItemLength) else s)
    }
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val sorted = rows.sortBy(r => (-r.getEstimate, r.getItem)).take(limit)
    val items = new GenericArrayData(sorted.map { r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate, r.getLowerBound, r.getUpperBound)
    }.asInstanceOf[Array[Any]])
    InternalRow(items, serialize(buf))
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItemsAgg =
    copy(child = newChild)
}
