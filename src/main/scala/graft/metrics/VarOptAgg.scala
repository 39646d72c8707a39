package graft.metrics

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.{VarOptItemsSketch, VarOptItemsUnion}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VarOpt (variance-optimal) reservoir sample of string values — the
  * sketch the reference's ConditionValidator uses for failing-value
  * samples (`core/validators/condition_validator.py:47,80-84`).
  * Unit weights make it a uniform bounded reservoir; the buffer holds at
  * most k items through partial, merge and final. NULL inputs are
  * skipped, so `when(cond, value)` samples exactly the matching rows.
  *
  * Note: reservoir sampling is inherently randomized — results are a
  * uniform sample, not a deterministic set (sample SIZE is
  * deterministic: min(k, matching rows)).
  */
case class VarOptAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VarOptItemsSketch[String]] with UnaryLike[Expression] {

  require(k > 0, "sample size must be positive")

  override def prettyName: String = "graft_varopt_sample"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): VarOptItemsSketch[String] =
    VarOptItemsSketch.newInstance[String](k)

  override def update(buf: VarOptItemsSketch[String], input: InternalRow): VarOptItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString, 1.0)
    buf
  }

  override def merge(a: VarOptItemsSketch[String], b: VarOptItemsSketch[String]): VarOptItemsSketch[String] = {
    val u = VarOptItemsUnion.newInstance[String](k)
    u.update(a)
    u.update(b)
    u.getResult
  }

  override def eval(buf: VarOptItemsSketch[String]): Any = {
    val it = buf.getSketchSamples.iterator()
    val out = Seq.newBuilder[Any]
    while (it.hasNext) out += UTF8String.fromString(it.next().getItem)
    new GenericArrayData(out.result().toArray)
  }

  // ArrayOfStringsSerDe is stateless but not java-serializable; rebuild
  // on demand so the aggregate ships cleanly to executors.
  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def serialize(buf: VarOptItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): VarOptItemsSketch[String] =
    VarOptItemsSketch.heapify(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VarOptAgg =
    copy(child = newChild)
}
