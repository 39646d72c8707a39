package graft.metrics

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed Bloom-filter build: fold pre-computed bit positions (an
  * `array<int>` column, one entry per hash function) into a fixed-size
  * bitset with bitwise-OR merge.
  *
  * This is the classic distributed Bloom construction: every partition
  * builds a partial bitset map-side (Spark's partial aggregation), and
  * the single exchange ships ONE `numBits/8`-byte buffer per partition
  * regardless of row count — the same partial/final shape as the other
  * sketch aggregates here. The memory-bounded membership filter is the
  * standard large-corpus exact-dedup device (e.g. Dolma's bloom dedup,
  * arXiv:2402.00159 §2.2) when a distinct-key shuffle or join is too
  * expensive: false positives drop a few unique docs, never keep a
  * duplicate.
  *
  * Position derivation is the caller's job ([[graft.pipeline.Dedup]]
  * exposes an md5 mode, which a SQL oracle replays verbatim, and an
  * xxhash64 production mode); this aggregate only sets bits, so the two
  * modes share one tested code path. NULL position arrays (NULL input
  * key upstream) are skipped. Output: `array<bigint>` of
  * `ceil(numBits/64)` little-endian words.
  *
  * Scale note: the bitset must fit in one aggregation buffer and later
  * broadcast to probers — size `numBits` for the corpus (10 bits/key ≈
  * 1% FP at k=4; 1e9 keys ≈ 1.25 GB). Past broadcast budget, use the
  * sharded path ([[graft.pipeline.Dedup.bloomBuildSharded]] /
  * [[graft.pipeline.Dedup.bloomProbeSharded]]): one independent bloom
  * per hash-prefix shard via a `groupBy(shard)` over this same
  * aggregate, probes co-partitioned by the same prefix (shuffle join,
  * no broadcast).
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")

  private def numWords: Int = numBits / 64

  override def prettyName: String = "graft_bloom_build"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val pos = arr.getInt(i)
        require(pos >= 0 && pos < numBits, s"bit position $pos out of range [0, $numBits)")
        buf(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf(_)).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}
