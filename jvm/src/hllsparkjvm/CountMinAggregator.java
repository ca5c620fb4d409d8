package hllsparkjvm;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;

import com.esotericsoftware.kryo.Kryo;
import com.esotericsoftware.kryo.KryoSerializable;
import com.esotericsoftware.kryo.io.Input;
import com.esotericsoftware.kryo.io.Output;
import org.apache.spark.sql.Encoder;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.expressions.Aggregator;

/**
 * Count-Min reduction as a typed aggregate buffer (TypedImperativeAggregate
 * via functions.udaf) — one flat long[depth×width] per group, updated in
 * place per row; merge is elementwise add.
 *
 * Bit-parity contract with hllspark.sketches.countmin.CountMin: positions
 * are the same double-hash split of the canonicalized xxhash64 input
 * (h1 = h & 0xFFFFFFFF, h2 = (h >>> 32) | 1, (h1 + j*h2) mod width — the
 * sum never exceeds ~2^38 so signed-64 floorMod equals the uint64 modulo),
 * and total counts ROWS added.  NULL hashes are skipped; an all-NULL group
 * leaves total == 0, which the Python finalize maps to a SQL NULL sketch
 * (the reference strict-aggregate contract).  Canonical serialization stays
 * in Python — finish() emits a raw intermediate blob.
 */
public final class CountMinAggregator
    extends Aggregator<Long, CountMinAggregator.Buf, byte[]> {

  private static final long serialVersionUID = 1L;

  private final int width;
  private final int depth;

  public CountMinAggregator(int width, int depth) {
    if ((long) depth * width > Integer.MAX_VALUE) {
      // long[depth*width] multiplies two ints: without this guard a width
      // >= ~2^26 at depth 64 wraps to a NegativeArraySizeException on the
      // executors instead of a clear driver-side error
      throw new IllegalArgumentException("depth * width exceeds the flat JVM buffer limit (2^31-1 cells)");
    }
    this.width = width;
    this.depth = depth;
  }

  public static final class Buf implements KryoSerializable, java.io.Serializable {
    private static final long serialVersionUID = 1L;

    int width;
    int depth;
    long[] counts; // depth × width, row-major
    long total;

    public Buf() {}

    Buf(int width, int depth) {
      this.width = width;
      this.depth = depth;
      this.counts = new long[depth * width];
    }

    // Kryo buffer transport (see HllRegisterAggregator.Buf.write for why).
    // Counts go var-length: most cells of a partial buffer hold small
    // values (or zero), so varints shrink the shuffled record well below
    // the flat 8 B/cell form.
    @Override
    public void write(Kryo kryo, Output out) {
      out.writeInt(width);
      out.writeInt(depth);
      out.writeVarLong(total, true);
      for (long c : counts) out.writeVarLong(c, true);
    }

    @Override
    public void read(Kryo kryo, Input in) {
      width = in.readInt();
      depth = in.readInt();
      total = in.readVarLong(true);
      counts = new long[depth * width];
      for (int i = 0; i < counts.length; i++) counts[i] = in.readVarLong(true);
    }
  }

  @Override
  public Buf zero() {
    return new Buf(width, depth);
  }

  @Override
  public Buf reduce(Buf buf, Long value) {
    if (value == null) return buf;
    long h = value;
    long h1 = h & 0xFFFFFFFFL;
    long h2 = (h >>> 32) | 1L;
    for (int j = 0; j < depth; j++) {
      int pos = (int) Math.floorMod(h1 + j * h2, (long) width);
      buf.counts[j * width + pos]++;
    }
    buf.total++;
    return buf;
  }

  @Override
  public Buf merge(Buf a, Buf c) {
    for (int i = 0; i < a.counts.length; i++) a.counts[i] += c.counts[i];
    a.total += c.total;
    return a;
  }

  /** Blob (little-endian): u8 version=1 | i32 width | i32 depth |
   *  i64 total | depth×width × i64 counts.  total == 0 ⇒ all-NULL group. */
  @Override
  public byte[] finish(Buf buf) {
    ByteBuffer bb = ByteBuffer.allocate(1 + 4 + 4 + 8 + 8 * buf.counts.length);
    bb.order(ByteOrder.LITTLE_ENDIAN);
    bb.put((byte) 1);
    bb.putInt(buf.width);
    bb.putInt(buf.depth);
    bb.putLong(buf.total);
    for (long c : buf.counts) bb.putLong(c);
    return bb.array();
  }

  @Override
  public Encoder<Buf> bufferEncoder() {
    return Encoders.kryo(Buf.class);
  }

  @Override
  public Encoder<byte[]> outputEncoder() {
    return Encoders.BINARY();
  }
}
