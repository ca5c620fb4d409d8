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
 * KLL reduction as a typed aggregate buffer with the same TWO-MODE design
 * as TDigestAggregator:
 *
 *  - EXACT mode (≤ exactCap distinct values): open-addressing value→count
 *    map; the Python finalize replays the identical sorted
 *    binary-weight-decomposition insert as sketches/jvm.py kll_jvm →
 *    byte-identical sketches to the groupBy builder (tested).
 *
 *  - COMPACTOR mode past exactCap: real KLL levels (Karnin, Lang & Liberty
 *    2016) with the same capacity schedule and deterministic alternating
 *    compaction coin as hllspark.sketches.kll (max(2, ceil(k·(2/3)^d)),
 *    offset = compactions & 1) — the buffer is BOUNDED at O(k) items
 *    regardless of input cardinality.  Level contents then depend on
 *    partition/merge order (within the ~1.33/k rank-error bound), so
 *    compactor-mode results are not bit-reproducible run-to-run —
 *    documented in hllspark.jvm_udaf.kll_jvm_udaf.
 *
 * NULLs skipped (NaN projected to NULL upstream); zero ingested values →
 * SQL NULL sketch via the Python finalize (strict-aggregate contract).
 */
public final class KllAggregator
    extends Aggregator<Double, KllAggregator.Buf, byte[]> {

  private static final long serialVersionUID = 1L;

  private final int k;
  private final int exactCap;

  public KllAggregator(int k, int exactCap) {
    if (k < 8 || k > 65535) throw new IllegalArgumentException("k must be in [8, 65535]");
    if (exactCap < 16) throw new IllegalArgumentException("exactCap must be >= 16");
    this.k = k;
    this.exactCap = exactCap;
  }

  /** max(2, ceil(k * (2/3)^(depth-1-height))) — kll.py _capacity. */
  static int capacity(int k, int depth, int height) {
    return Math.max(2, (int) Math.ceil(k * Math.pow(2.0 / 3.0, depth - 1 - height)));
  }

  public static final class Buf implements KryoSerializable, java.io.Serializable {
    private static final long serialVersionUID = 1L;

    int k;
    int exactCap;
    DoubleCountMap map; // non-null == exact mode

    // compactor mode
    double[][] levels;  // levels[h][0..levelLen[h]) items of weight 2^h
    int[] levelLen;
    int nlevels;
    long total;
    long compactions;
    double vmin = Double.POSITIVE_INFINITY;
    double vmax = Double.NEGATIVE_INFINITY;

    public Buf() {}

    Buf(int k, int exactCap) {
      this.k = k;
      this.exactCap = exactCap;
      this.map = new DoubleCountMap();
    }

    private void ensureLevel(int h) {
      if (levels == null) {
        levels = new double[Math.max(h + 1, 4)][];
        levelLen = new int[levels.length];
      } else if (h >= levels.length) {
        double[][] nl = new double[Math.max(h + 1, levels.length * 2)][];
        int[] nn = new int[nl.length];
        System.arraycopy(levels, 0, nl, 0, nlevels);
        System.arraycopy(levelLen, 0, nn, 0, nlevels);
        levels = nl;
        levelLen = nn;
      }
      while (nlevels <= h) {
        if (levels[nlevels] == null) levels[nlevels] = new double[8];
        nlevels++;
      }
    }

    private void appendLevel(int h, double v) {
      ensureLevel(h);
      if (levelLen[h] == levels[h].length) {
        levels[h] = java.util.Arrays.copyOf(levels[h], levels[h].length * 2);
      }
      levels[h][levelLen[h]++] = v;
    }

    /** Package hook for KllBlobMergeAggregator: raw append at a height
     *  (caller compacts afterwards, mirroring kll.py merge). */
    void ingestLevelItem(int h, double v) {
      appendLevel(h, v);
    }

    void compact() {
      boolean changed = true;
      while (changed) {
        changed = false;
        for (int h = 0; h < nlevels; h++) {
          int cap = capacity(k, Math.max(nlevels, h + 2), h);
          if (levelLen[h] <= cap) continue;
          java.util.Arrays.sort(levels[h], 0, levelLen[h]);
          int offset = (int) (compactions & 1); // deterministic alternating coin
          compactions++;
          int len = levelLen[h];
          levelLen[h] = 0; // clear BEFORE promoting (promotion may grow arrays)
          for (int i = offset; i < len; i += 2) appendLevel(h + 1, levels[h][i]);
          changed = true;
        }
      }
    }

    void promote() {
      long[] bits = map.sortedValuesBits();
      int len = bits.length;
      double[] v = new double[len];
      long[] c = new long[len];
      long maxc = 0;
      for (int i = 0; i < len; i++) {
        v[i] = Double.longBitsToDouble(bits[i]);
        c[i] = map.countOf(v[i]);
        if (c[i] > maxc) maxc = c[i];
      }
      map = null;
      ensureLevel(0);
      if (len == 0) return;
      vmin = v[0];
      vmax = v[len - 1];
      for (long cc : c) total += cc;
      // binary weight decomposition, level-batched like kll.py update_weighted
      for (int h = 0; h < 64 - Long.numberOfLeadingZeros(maxc); h++) {
        boolean any = false;
        for (int i = 0; i < len; i++) {
          if (((c[i] >> h) & 1L) == 1L) {
            appendLevel(h, v[i]);
            any = true;
          }
        }
        if (any) compact();
      }
    }

    void addOne(double v) { // compactor mode only
      if (v < vmin) vmin = v;
      if (v > vmax) vmax = v;
      total++;
      appendLevel(0, v);
      if (levelLen[0] > capacity(k, Math.max(nlevels, 2), 0)) compact();
    }

    void ingest(double v, long c) {
      if (map != null) {
        map.add(v, c);
        if (map.n > exactCap) promote();
        return;
      }
      // weighted insert via binary decomposition (exact, no sampling)
      if (v < vmin) vmin = v;
      if (v > vmax) vmax = v;
      total += c;
      for (int h = 0; h < 64 - Long.numberOfLeadingZeros(c); h++) {
        if (((c >> h) & 1L) == 1L) appendLevel(h, v);
      }
      compact();
    }

    // Kryo buffer transport (see HllRegisterAggregator.Buf.write for why)
    @Override
    public void write(Kryo kryo, Output out) {
      out.writeVarInt(k, true);
      out.writeVarInt(exactCap, true);
      out.writeBoolean(map != null);
      if (map != null) {
        out.writeVarInt(map.n, true);
        for (int i = 0; i < map.keys.length; i++) {
          if (map.counts[i] != 0) {
            out.writeLong(map.keys[i]);
            out.writeVarLong(map.counts[i], true);
          }
        }
        return;
      }
      out.writeVarInt(nlevels, true);
      out.writeVarLong(total, true);
      out.writeVarLong(compactions, true);
      out.writeDouble(vmin);
      out.writeDouble(vmax);
      for (int h = 0; h < nlevels; h++) {
        out.writeVarInt(levelLen[h], true);
        for (int i = 0; i < levelLen[h]; i++) out.writeDouble(levels[h][i]);
      }
    }

    @Override
    public void read(Kryo kryo, Input in) {
      k = in.readVarInt(true);
      exactCap = in.readVarInt(true);
      boolean exact = in.readBoolean();
      if (exact) {
        map = new DoubleCountMap();
        int cnt = in.readVarInt(true);
        for (int i = 0; i < cnt; i++) {
          long bits = in.readLong();
          map.add(Double.longBitsToDouble(bits), in.readVarLong(true));
        }
        return;
      }
      map = null;
      int nl = in.readVarInt(true);
      total = in.readVarLong(true);
      compactions = in.readVarLong(true);
      vmin = in.readDouble();
      vmax = in.readDouble();
      for (int h = 0; h < nl; h++) {
        int len = in.readVarInt(true);
        ensureLevel(h);
        for (int i = 0; i < len; i++) appendLevel(h, in.readDouble());
      }
      if (nl == 0) ensureLevel(0);
    }
  }

  @Override
  public Buf zero() {
    return new Buf(k, exactCap);
  }

  @Override
  public Buf reduce(Buf buf, Double value) {
    if (value == null) return buf;
    if (buf.map != null) {
      buf.map.add(value, 1L);
      if (buf.map.n > exactCap) buf.promote();
    } else {
      buf.addOne(value);
    }
    return buf;
  }

  @Override
  public Buf merge(Buf a, Buf c) {
    if (a.map != null && c.map != null) {
      for (int i = 0; i < c.map.keys.length; i++) {
        if (c.map.counts[i] != 0) {
          a.ingest(Double.longBitsToDouble(c.map.keys[i]), c.map.counts[i]);
        }
      }
      return a;
    }
    if (a.map != null) a.promote();
    if (c.map != null) c.promote();
    if (c.total == 0) return a;
    // kll.py merge: concatenate levels, sum totals/compactions, compact
    for (int h = 0; h < c.nlevels; h++) {
      for (int i = 0; i < c.levelLen[h]; i++) a.appendLevel(h, c.levels[h][i]);
    }
    a.total += c.total;
    a.compactions += c.compactions;
    if (c.vmin < a.vmin) a.vmin = c.vmin;
    if (c.vmax > a.vmax) a.vmax = c.vmax;
    a.compact();
    return a;
  }

  /**
   * Blob (little-endian), finalized by hllspark.jvm_udaf._kll_blob_to_bytes:
   *   u8 version=1 | u8 mode | u16 k |
   *   mode 0 (exact):     i32 n | n × f64 values | n × i64 counts (unsorted)
   *   mode 1 (compactor): i32 nlevels | i64 total | i64 compactions |
   *                       f64 vmin | f64 vmax | nlevels × i32 sizes |
   *                       concatenated level items (f64)
   * mode 0 with n == 0 ⇒ all-NULL group.
   */
  @Override
  public byte[] finish(Buf buf) {
    if (buf.map != null) {
      int n = buf.map.n;
      ByteBuffer bb = ByteBuffer.allocate(1 + 1 + 2 + 4 + 16 * n);
      bb.order(ByteOrder.LITTLE_ENDIAN);
      bb.put((byte) 1);
      bb.put((byte) 0);
      bb.putShort((short) buf.k);
      bb.putInt(n);
      for (int i = 0; i < buf.map.keys.length; i++) {
        if (buf.map.counts[i] != 0) bb.putDouble(Double.longBitsToDouble(buf.map.keys[i]));
      }
      for (int i = 0; i < buf.map.keys.length; i++) {
        if (buf.map.counts[i] != 0) bb.putLong(buf.map.counts[i]);
      }
      return bb.array();
    }
    int items = 0;
    for (int h = 0; h < buf.nlevels; h++) items += buf.levelLen[h];
    ByteBuffer bb = ByteBuffer.allocate(1 + 1 + 2 + 4 + 16 + 16 + 4 * buf.nlevels + 8 * items);
    bb.order(ByteOrder.LITTLE_ENDIAN);
    bb.put((byte) 1);
    bb.put((byte) 1);
    bb.putShort((short) buf.k);
    bb.putInt(buf.nlevels);
    bb.putLong(buf.total);
    bb.putLong(buf.compactions);
    bb.putDouble(buf.vmin);
    bb.putDouble(buf.vmax);
    for (int h = 0; h < buf.nlevels; h++) bb.putInt(buf.levelLen[h]);
    for (int h = 0; h < buf.nlevels; h++) {
      for (int i = 0; i < buf.levelLen[h]; i++) bb.putDouble(buf.levels[h][i]);
    }
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
