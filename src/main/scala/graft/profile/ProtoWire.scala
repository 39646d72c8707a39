package graft.profile

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format encoder/decoder (public spec:
  * https://protobuf.dev/programming-guides/encoding/). Spark's jars ship
  * only shaded protobuf, so the `WHY1` container (reference
  * `core/view/dataset_profile_view.py:264-460`) is framed with these
  * hand-rolled primitives instead of generated classes. Only the three
  * wire types the whylogs messages use are implemented: varint (0),
  * fixed64 (1) and length-delimited (2).
  */
private[profile] object ProtoWire {

  final val WireVarint = 0
  final val WireFixed64 = 1
  final val WireLen = 2
  final val WireFixed32 = 5

  final class Writer {
    private val buf = new ByteArrayOutputStream()

    def size: Int = buf.size()

    def toBytes: Array[Byte] = buf.toByteArray

    def writeTo(out: ByteArrayOutputStream): Unit = buf.writeTo(out)

    /** Unsigned LEB128; negative int64 is 10 bytes of two's complement,
      * exactly as protobuf encodes a negative `int64`. */
    def varint(v: Long): this.type = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        buf.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      buf.write(x.toInt)
      this
    }

    def tag(field: Int, wire: Int): this.type = varint((field.toLong << 3) | wire)

    /** varint-typed field; proto3 omits scalar defaults, so 0 is skipped
      * unless `emitZero` (oneof members are always present once set). */
    def varintField(field: Int, v: Long, emitZero: Boolean = false): this.type = {
      if (v != 0L || emitZero) { tag(field, WireVarint); varint(v) }
      this
    }

    def doubleField(field: Int, d: Double): this.type = {
      tag(field, WireFixed64)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { buf.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }

    def bytesField(field: Int, b: Array[Byte]): this.type = {
      tag(field, WireLen); varint(b.length.toLong); buf.write(b, 0, b.length)
      this
    }

    def stringField(field: Int, s: String, emitEmpty: Boolean = false): this.type = {
      if (s.nonEmpty || emitEmpty) bytesField(field, s.getBytes("UTF-8"))
      this
    }

    def msgField(field: Int, m: Writer): this.type = {
      tag(field, WireLen); varint(m.size.toLong); m.writeTo(buf)
      this
    }

    /** Packed repeated uint64 (proto3 default packing for scalars). */
    def packedVarints(field: Int, vs: Seq[Long]): this.type = {
      val inner = new Writer
      vs.foreach(inner.varint)
      msgField(field, inner)
    }

    def raw(b: Array[Byte]): this.type = { buf.write(b, 0, b.length); this }

    /** Varint-length-delimited message, the framing of the reference's
      * `write_delimited_protobuf` (`core/utils/protobuf_utils.py`). */
    def delimited(m: Writer): this.type = { varint(m.size.toLong); m.writeTo(buf); this }
  }

  final class Reader(val bytes: Array[Byte], start: Int, val end: Int) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)
    var pos: Int = start

    def hasRemaining: Boolean = pos < end

    /** Independent cursor into the same backing array (chunk-offset reads). */
    def subReader(from: Int, to: Int): Reader = new Reader(bytes, from, to)

    def readVarint(): Long = {
      var shift = 0
      var res = 0L
      var b = 0
      do {
        require(pos < end && shift < 64, "malformed varint")
        b = bytes(pos) & 0xff
        pos += 1
        res |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      res
    }

    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def readDouble(): Double = {
      require(pos + 8 <= end, "truncated fixed64")
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, "truncated bytes field")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      out
    }

    def readString(): String = new String(readBytes(), "UTF-8")

    /** Sub-reader over a length-delimited field's payload. */
    def readMessage(): Reader = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, "truncated message field")
      val r = new Reader(bytes, pos, pos + len)
      pos += len
      r
    }

    def skip(wire: Int): Unit = wire match {
      case WireVarint  => readVarint(); ()
      case WireFixed64 => require(pos + 8 <= end); pos += 8
      case WireLen     => val len = readVarint().toInt; require(pos + len <= end); pos += len
      case WireFixed32 => require(pos + 4 <= end); pos += 4
      case other       => throw new IllegalArgumentException(s"unsupported wire type $other")
    }

    /** Packed or unpacked repeated varints for `field` (call with the
      * already-read wire type). */
    def readRepeatedVarints(wire: Int): Seq[Long] =
      if (wire == WireLen) {
        val m = readMessage()
        val b = Seq.newBuilder[Long]
        while (m.hasRemaining) b += m.readVarint()
        b.result()
      } else Seq(readVarint())
  }
}
