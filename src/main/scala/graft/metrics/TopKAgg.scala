package graft.metrics

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: at most `k` (score, payload) pairs, ordered
  * lexicographically on (score, payload). `largest = true` keeps the k
  * largest pairs (classic top-k); `false` the k smallest (first-k
  * sampling). The heap root is always the next element to evict, so
  * update and merge are O(log k) with O(k) memory — never the
  * per-partition candidate count.
  */
final class TopKBuffer(val k: Int, val largest: Boolean) {

  /** Root = worst kept element (smallest when keeping largest, and vice
    * versa), so `peek` is the eviction candidate. */
  private[metrics] val heap = new java.util.PriorityQueue[(Double, Any)](
    math.max(1, k),
    new java.util.Comparator[(Double, Any)] {
      override def compare(a: (Double, Any), b: (Double, Any)): Int = {
        val c = TopKBuffer.cmp(a, b)
        if (largest) c else -c
      }
    })

  def insert(score: Double, payload: Any): Unit = {
    if (heap.size < k) heap.add((score, payload))
    else {
      val root = heap.peek()
      val c = TopKBuffer.cmp((score, payload), root)
      val better = if (largest) c > 0 else c < 0
      if (better) { heap.poll(); heap.add((score, payload)) }
    }
  }

  def mergeIn(o: TopKBuffer): Unit = {
    val it = o.heap.iterator()
    while (it.hasNext) { val (s, p) = it.next(); insert(s, p) }
  }

  /** Entries best-first: descending for largest, ascending for smallest. */
  def sortedEntries: Array[(Double, Any)] = {
    val arr = heap.toArray(new Array[(Double, Any)](heap.size))
    val asc = arr.sortWith((a, b) => TopKBuffer.cmp(a, b) < 0)
    if (largest) asc.reverse else asc
  }
}

object TopKBuffer {
  /** Lexicographic (score, payload); payloads are Long or UTF8String,
    * both Comparable. */
  def cmp(a: (Double, Any), b: (Double, Any)): Int = {
    val c = java.lang.Double.compare(a._1, b._1)
    if (c != 0) c
    else a._2.asInstanceOf[Comparable[Any]].compareTo(b._2)
  }
}

/** Bounded-heap top-k aggregate: the partial/final shape of Spark's own
  * TakeOrdered, usable per group — replaces collect_list+slice patterns
  * whose partial buffers grow with the candidate count (executor OOM at
  * scale). Output: array<struct<score double, id payloadType>> sorted
  * best-first.
  *
  * Payload supports LongType and StringType (covers ids and identity
  * values); extendable by adding serde arms.
  */
case class TopKAgg(
    score: Expression,
    payload: Expression,
    k: Int,
    largest: Boolean = true,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, "top-k requires k > 0")

  private def payloadIsString = payload.dataType == StringType

  override def left: Expression = score
  override def right: Expression = payload
  override def prettyName: String = "graft_top_k"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!score.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      TypeCheckFailure(s"graft_top_k score must be numeric, got ${score.dataType.sql}")
    else if (payload.dataType != LongType && payload.dataType != StringType)
      // fail at analysis, not mid-shuffle in serialize
      TypeCheckFailure(s"graft_top_k payload must be BIGINT or STRING, got ${payload.dataType.sql}")
    else TypeCheckSuccess
  }
  // def, not val: children may be unresolved at construction time (the
  // analyzer copies the node while rewriting attributes).
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", payload.dataType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, largest)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // UTF8String from eval may be backed by reused row memory; copy.
      val owned = p match {
        case u: UTF8String => u.clone()
        case other         => other
      }
      buf.insert(NumericCoercion.toDouble(s), owned)
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeIn(b); a }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (s, p) =>
      InternalRow(s, p)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sortedEntries
    out.writeInt(entries.length)
    entries.foreach { case (s, p) =>
      out.writeDouble(s)
      p match {
        case l: java.lang.Long => out.writeLong(l)
        case u: UTF8String =>
          val bytes = u.getBytes
          out.writeInt(bytes.length); out.write(bytes)
        case other => throw new IllegalArgumentException(
          s"graft_top_k: unsupported payload ${other.getClass}")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k, largest)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val p: Any =
        if (payloadIsString) {
          val len = in.readInt()
          val arr = new Array[Byte](len)
          in.readFully(arr)
          UTF8String.fromBytes(arr)
        } else java.lang.Long.valueOf(in.readLong())
      buf.insert(s, p)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, payload = newRight)
}
