package graft.metrics

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
  * The sketch tracks UTF8String items (no UTF-8 → UTF-16 decode on the
  * per-row hot path — FI is the most expensive standard metric, and the
  * decode was a third of its cost); the serialized image is
  * wire-identical to a String sketch (ArrayOfUTF8SerDe), so views and
  * cross-language readers are unaffected.
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
  extends TypedImperativeAggregate[ItemsSketch[UTF8String]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_frequent_items"
  override def nullable: Boolean = false
  override val dataType: DataType = FrequentItemsAgg.dataTypeStatic

  @transient private lazy val serde = new ArrayOfUTF8SerDe

  override def createAggregationBuffer(): ItemsSketch[UTF8String] =
    new ItemsSketch[UTF8String](1 << lgMaxK)

  override def update(buf: ItemsSketch[UTF8String], input: InternalRow): ItemsSketch[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v match {
        case u: UTF8String =>
          // truncate to 128 CHARS like the reference; clone because eval
          // results may be backed by reused row memory
          if (u.numChars > FrequentItemsAgg.MaxItemLength)
            u.substring(0, FrequentItemsAgg.MaxItemLength)
          else u.clone()
        case b: java.lang.Boolean =>
          UTF8String.fromString(if (b) "True" else "False") // `metrics.py:472-485`
        case other => UTF8String.fromString(other.toString)
      }
      buf.update(item)
    }
    buf
  }

  override def merge(a: ItemsSketch[UTF8String], b: ItemsSketch[UTF8String]): ItemsSketch[UTF8String] =
    a.merge(b)

  override def eval(buf: ItemsSketch[UTF8String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val sorted = rows.sortWith { (x, y) =>
      x.getEstimate > y.getEstimate ||
        (x.getEstimate == y.getEstimate && x.getItem.compareTo(y.getItem) < 0)
    }.take(limit)
    val items = new GenericArrayData(sorted.map { r =>
      InternalRow(r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound)
    }.asInstanceOf[Array[Any]])
    InternalRow(items, serialize(buf))
  }

  override def serialize(buf: ItemsSketch[UTF8String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[UTF8String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItemsAgg =
    copy(child = newChild)
}
