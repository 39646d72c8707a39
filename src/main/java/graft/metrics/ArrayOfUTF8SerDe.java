package graft.metrics;

import org.apache.datasketches.common.ArrayOfItemsSerDe;
import org.apache.datasketches.common.ByteArrayUtil;
import org.apache.datasketches.memory.Memory;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * Items-serde for UTF8String, wire-identical to DataSketches'
 * ArrayOfStringsSerDe (4-byte little-endian length + UTF-8 bytes per
 * item) — a sketch of UTF8Strings serializes to the exact bytes a String
 * sketch would, keeping profile sketch images cross-language compatible
 * while the per-row update path skips the UTF-8 → UTF-16 decode.
 *
 * (Java, not Scala: overriding the generic-array method of a Java class
 * from Scala trips the `Array[T with Object]` bridge-signature issue.)
 */
public final class ArrayOfUTF8SerDe extends ArrayOfItemsSerDe<UTF8String> {

  @Override
  public byte[] serializeToByteArray(final UTF8String item) {
    final byte[] b = item.getBytes();
    final byte[] out = new byte[4 + b.length];
    ByteArrayUtil.putIntLE(out, 0, b.length);
    System.arraycopy(b, 0, out, 4, b.length);
    return out;
  }

  @Override
  public byte[] serializeToByteArray(final UTF8String[] items) {
    int total = 0;
    for (final UTF8String it : items) total += 4 + it.numBytes();
    final byte[] out = new byte[total];
    int off = 0;
    for (final UTF8String it : items) {
      final byte[] b = it.getBytes();
      ByteArrayUtil.putIntLE(out, off, b.length);
      System.arraycopy(b, 0, out, off + 4, b.length);
      off += 4 + b.length;
    }
    return out;
  }

  @Override
  public UTF8String[] deserializeFromMemory(final Memory mem, final long offsetBytes, final int numItems) {
    final UTF8String[] out = new UTF8String[numItems];
    long off = offsetBytes;
    for (int i = 0; i < numItems; i++) {
      final int len = mem.getInt(off);
      final byte[] b = new byte[len];
      mem.getByteArray(off + 4, b, 0, len);
      out[i] = UTF8String.fromBytes(b);
      off += 4 + len;
    }
    return out;
  }

  @Override
  public int sizeOf(final UTF8String item) {
    return 4 + item.numBytes();
  }

  @Override
  public int sizeOf(final Memory mem, final long offsetBytes, final int numItems) {
    long off = offsetBytes;
    for (int i = 0; i < numItems; i++) off += 4 + mem.getInt(off);
    return (int) (off - offsetBytes);
  }

  @Override
  public String toString(final UTF8String item) {
    return item.toString();
  }

  @Override
  public Class<UTF8String> getClassOfT() {
    return UTF8String.class;
  }
}
