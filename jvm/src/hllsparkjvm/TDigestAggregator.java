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
 * t-digest reduction as a typed aggregate buffer with a TWO-MODE buffer,
 * the quantile analogue of the HLL sparse→dense design:
 *
 *  - EXACT mode: an open-addressing value→count map (DoubleCountMap) while
 *    the buffer has ≤ exactCap distinct values.  If every buffer of a group
 *    stays exact, the Python finalize replays the identical sorted weighted
 *    fold as sketches/jvm.py tdigest_jvm — byte-identical sketches to the
 *    groupBy builder (tested), and nothing larger than the true distinct
 *    set ever ships in the shuffle.
 *
 *  - DIGEST mode past exactCap: the map is folded into ≤ ~δ/2 k1-scale
 *    centroids (Dunning & Ertl 2019, the same scale function as
 *    hllspark.sketches.tdigest._compress) and the buffer stays BOUNDED —
 *    O(δ) centroids + an O(δ) pending batch — which is what the groupBy
 *    builder cannot do on continuous columns (its reduction ships one row
 *    per distinct value).  Accuracy keeps the k1-scale rank-error bound;
 *    like every practical t-digest the centroid layout then depends on
 *    partition/merge order (within the bound), so digest-mode results are
 *    NOT bit-reproducible run-to-run — documented in
 *    hllspark.jvm_udaf.tdigest_jvm_udaf.
 *
 * NULL values are skipped (NaN is projected to NULL before the aggregator,
 * mirroring sketches/jvm.py _value_counts); a group with zero ingested
 * values finishes with total == 0 → SQL NULL sketch in the Python finalize
 * (strict-aggregate contract).
 */
public final class TDigestAggregator
    extends Aggregator<Double, TDigestAggregator.Buf, byte[]> {

  private static final long serialVersionUID = 1L;

  private final int delta;
  private final int exactCap;

  public TDigestAggregator(int delta, int exactCap) {
    if (delta < 10 || delta > 10000) throw new IllegalArgumentException("delta must be in [10, 10000]");
    if (exactCap < 16) throw new IllegalArgumentException("exactCap must be >= 16");
    this.delta = delta;
    this.exactCap = exactCap;
  }

  /** Parallel-array quicksort of (v, w) by v ascending (no boxing). */
  static void sortPairs(double[] v, double[] w, int lo, int hi) {
    while (lo < hi) {
      if (hi - lo < 16) {
        for (int i = lo + 1; i <= hi; i++) {
          double kv = v[i], kw = w[i];
          int j = i - 1;
          while (j >= lo && v[j] > kv) {
            v[j + 1] = v[j];
            w[j + 1] = w[j];
            j--;
          }
          v[j + 1] = kv;
          w[j + 1] = kw;
        }
        return;
      }
      int mid = (lo + hi) >>> 1;
      double pivot = Math.max(Math.min(v[lo], v[mid]), Math.min(Math.max(v[lo], v[mid]), v[hi]));
      int i = lo, j = hi;
      while (i <= j) {
        while (v[i] < pivot) i++;
        while (v[j] > pivot) j--;
        if (i <= j) {
          double t = v[i]; v[i] = v[j]; v[j] = t;
          t = w[i]; w[i] = w[j]; w[j] = t;
          i++;
          j--;
        }
      }
      // recurse on the smaller side, loop on the larger (bounded stack)
      if (j - lo < hi - i) {
        sortPairs(v, w, lo, j);
        lo = i;
      } else {
        sortPairs(v, w, i, hi);
        hi = j;
      }
    }
  }

  public static final class Buf implements KryoSerializable, java.io.Serializable {
    private static final long serialVersionUID = 1L;

    int delta;
    int exactCap;
    DoubleCountMap map; // non-null == exact mode

    // digest mode
    double[] means;   // sorted centroids
    double[] weights;
    int ncent;
    double[] pvals;   // unfolded pending batch
    double[] pwts;
    int npend;
    double total;
    double vmin = Double.POSITIVE_INFINITY;
    double vmax = Double.NEGATIVE_INFINITY;

    public Buf() {}

    Buf(int delta, int exactCap) {
      this.delta = delta;
      this.exactCap = exactCap;
      this.map = new DoubleCountMap();
    }

    private int pendCap() {
      return Math.max(512, 4 * delta);
    }

    /** k1-scale fold of sorted (v, w)[0..len) into this.means/weights —
     *  the same scale function as hllspark.sketches.tdigest._compress. */
    private void compressInto(double[] v, double[] w, int len) {
      double W = 0;
      for (int i = 0; i < len; i++) W += w[i];
      if (len == 0 || W == 0) {
        ncent = 0;
        total = 0;
        return;
      }
      double[] om = new double[len];
      double[] ow = new double[len];
      int out = -1;
      double cum = 0;
      long prevCluster = Long.MIN_VALUE;
      double scale = delta / (2 * Math.PI);
      for (int i = 0; i < len; i++) {
        double qmid = (cum + 0.5 * w[i]) / W;
        cum += w[i];
        double x = 2.0 * qmid - 1.0;
        if (x < -1.0) x = -1.0;
        if (x > 1.0) x = 1.0;
        long cluster = (long) Math.floor(scale * Math.asin(x) + delta / 4.0);
        if (out < 0 || cluster != prevCluster) {
          out++;
          om[out] = w[i] * v[i];
          ow[out] = w[i];
          prevCluster = cluster;
        } else {
          om[out] += w[i] * v[i];
          ow[out] += w[i];
        }
      }
      ncent = out + 1;
      if (means == null || means.length < ncent) {
        means = new double[Math.max(ncent, delta + 8)];
        weights = new double[means.length];
      }
      for (int i = 0; i < ncent; i++) {
        means[i] = om[i] / ow[i];
        weights[i] = ow[i];
      }
      total = W;
    }

    void promote() {
      long[] bits = map.sortedValuesBits();
      int len = bits.length;
      double[] v = new double[len];
      double[] w = new double[len];
      for (int i = 0; i < len; i++) {
        v[i] = Double.longBitsToDouble(bits[i]);
        w[i] = map.countOf(v[i]);
      }
      if (len > 0) {
        vmin = v[0];
        vmax = v[len - 1];
      }
      map = null;
      pvals = new double[pendCap()];
      pwts = new double[pendCap()];
      npend = 0;
      compressInto(v, w, len);
    }

    void flushPending() {
      if (npend == 0) return;
      sortPairs(pvals, pwts, 0, npend - 1);
      // linear merge of the sorted centroids with the sorted pending batch
      int len = ncent + npend;
      double[] v = new double[len];
      double[] w = new double[len];
      int i = 0, j = 0, o = 0;
      while (i < ncent && j < npend) {
        if (means[i] <= pvals[j]) {
          v[o] = means[i];
          w[o++] = weights[i++];
        } else {
          v[o] = pvals[j];
          w[o++] = pwts[j++];
        }
      }
      while (i < ncent) {
        v[o] = means[i];
        w[o++] = weights[i++];
      }
      while (j < npend) {
        v[o] = pvals[j];
        w[o++] = pwts[j++];
      }
      npend = 0;
      compressInto(v, w, len);
    }

    void addWeighted(double v, double wt) { // digest mode only
      if (v < vmin) vmin = v;
      if (v > vmax) vmax = v;
      pvals[npend] = v;
      pwts[npend] = wt;
      npend++;
      if (npend >= pvals.length) flushPending();
    }

    /** Mode-dispatching ingest (promotes when the exact map overflows). */
    void ingest(double v, long c) {
      if (map != null) {
        map.add(v, c);
        if (map.n > exactCap) promote();
      } else {
        addWeighted(v, (double) c);
      }
    }

    // Kryo buffer transport (see HllRegisterAggregator.Buf.write for why)
    @Override
    public void write(Kryo kryo, Output out) {
      out.writeVarInt(delta, true);
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
      flushPending(); // ship only the folded centroids
      out.writeVarInt(ncent, true);
      out.writeDouble(total);
      out.writeDouble(vmin);
      out.writeDouble(vmax);
      for (int i = 0; i < ncent; i++) out.writeDouble(means[i]);
      for (int i = 0; i < ncent; i++) out.writeDouble(weights[i]);
    }

    @Override
    public void read(Kryo kryo, Input in) {
      delta = in.readVarInt(true);
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
      ncent = in.readVarInt(true);
      total = in.readDouble();
      vmin = in.readDouble();
      vmax = in.readDouble();
      means = new double[Math.max(ncent, delta + 8)];
      weights = new double[means.length];
      for (int i = 0; i < ncent; i++) means[i] = in.readDouble();
      for (int i = 0; i < ncent; i++) weights[i] = in.readDouble();
      pvals = new double[pendCap()];
      pwts = new double[pendCap()];
      npend = 0;
    }
  }

  @Override
  public Buf zero() {
    return new Buf(delta, exactCap);
  }

  @Override
  public Buf reduce(Buf buf, Double value) {
    if (value == null) return buf;
    buf.ingest(value, 1L);
    return buf;
  }

  @Override
  public Buf merge(Buf a, Buf c) {
    if (a.map != null && c.map != null) {
      // exact × exact: sum the value multisets (ingest promotes a if the
      // union overflows, after which the rest streams into the digest)
      for (int i = 0; i < c.map.keys.length; i++) {
        if (c.map.counts[i] != 0) {
          a.ingest(Double.longBitsToDouble(c.map.keys[i]), c.map.counts[i]);
        }
      }
      return a;
    }
    if (a.map != null) a.promote();
    if (c.map != null) c.promote();
    a.flushPending();
    c.flushPending();
    if (c.ncent == 0) return a;
    if (c.vmin < a.vmin) a.vmin = c.vmin;
    if (c.vmax > a.vmax) a.vmax = c.vmax;
    int len = a.ncent + c.ncent;
    double[] v = new double[len];
    double[] w = new double[len];
    int i = 0, j = 0, o = 0;
    while (i < a.ncent && j < c.ncent) {
      if (a.means[i] <= c.means[j]) {
        v[o] = a.means[i];
        w[o++] = a.weights[i++];
      } else {
        v[o] = c.means[j];
        w[o++] = c.weights[j++];
      }
    }
    while (i < a.ncent) {
      v[o] = a.means[i];
      w[o++] = a.weights[i++];
    }
    while (j < c.ncent) {
      v[o] = c.means[j];
      w[o++] = c.weights[j++];
    }
    a.compressInto(v, w, len);
    return a;
  }

  /**
   * Blob (little-endian), finalized by hllspark.jvm_udaf._td_blob_to_bytes:
   *   u8 version=1 | u8 mode | u16 delta |
   *   mode 0 (exact):  i32 n | n × f64 values | n × i64 counts  (unsorted)
   *   mode 1 (digest): i32 ncent | f64 total | f64 vmin | f64 vmax |
   *                    ncent × f64 means | ncent × f64 weights
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
      bb.putShort((short) buf.delta);
      bb.putInt(n);
      for (int i = 0; i < buf.map.keys.length; i++) {
        if (buf.map.counts[i] != 0) bb.putDouble(Double.longBitsToDouble(buf.map.keys[i]));
      }
      for (int i = 0; i < buf.map.keys.length; i++) {
        if (buf.map.counts[i] != 0) bb.putLong(buf.map.counts[i]);
      }
      return bb.array();
    }
    buf.flushPending();
    ByteBuffer bb = ByteBuffer.allocate(1 + 1 + 2 + 4 + 24 + 16 * buf.ncent);
    bb.order(ByteOrder.LITTLE_ENDIAN);
    bb.put((byte) 1);
    bb.put((byte) 1);
    bb.putShort((short) buf.delta);
    bb.putInt(buf.ncent);
    bb.putDouble(buf.total);
    bb.putDouble(buf.vmin);
    bb.putDouble(buf.vmax);
    for (int i = 0; i < buf.ncent; i++) bb.putDouble(buf.means[i]);
    for (int i = 0; i < buf.ncent; i++) bb.putDouble(buf.weights[i]);
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
