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
 * Merge of STORED canonical t-digest blobs
 * (hllspark.sketches.tdigest.TDigest.to_bytes, header {@code <BBHqddd}:
 * version, pad, delta, n_centroids, total, vmin, vmax; payload means then
 * weights as f64).  Centroids are folded through the SAME k1-scale
 * machinery as TDigestAggregator's digest mode (pending batch + compress),
 * which is python TDigest.merge's concat-sort-compress within pending-batch
 * boundaries — rank error stays inside the k1 bound, centroid layout is
 * merge-order-dependent like every practical t-digest (no byte-parity
 * claim, matching the python engine).  True raw-data vmin/vmax are carried
 * from the blobs, not re-derived from centroid means.  Parameterless,
 * adopts delta from the first digest, refuses mismatches ("t-digest delta
 * differs", like TDigest.merge); empty stored digests (total == 0) are
 * skipped exactly as python merge does.
 */
public final class TDigestBlobMergeAggregator
    extends Aggregator<byte[], TDigestBlobMergeAggregator.Buf, byte[]> {

  private static final long serialVersionUID = 1L;

  public TDigestBlobMergeAggregator() {}

  public static final class Buf implements KryoSerializable, java.io.Serializable {
    private static final long serialVersionUID = 1L;

    TDigestAggregator.Buf state; // null until first blob; always digest-mode

    public Buf() {}

    @Override
    public void write(Kryo kryo, Output out) {
      out.writeBoolean(state != null);
      if (state != null) state.write(kryo, out);
    }

    @Override
    public void read(Kryo kryo, Input in) {
      state = null;
      if (in.readBoolean()) {
        state = new TDigestAggregator.Buf();
        state.read(kryo, in);
      }
    }
  }

  static void mergeBlob(Buf buf, byte[] blob) {
    ByteBuffer bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN);
    int version = bb.get() & 0xff;
    bb.get(); // pad
    int delta = bb.getShort() & 0xffff;
    long n = bb.getLong();
    double total = bb.getDouble();
    double vmin = bb.getDouble();
    double vmax = bb.getDouble();
    if (version > 1) throw new IllegalArgumentException("unsupported tdigest version " + version);
    if (delta < 10 || delta > 10000 || n < 0 || blob.length != 36 + 16 * n) {
      throw new IllegalArgumentException("tdigest header inconsistent with payload");
    }
    if (buf.state == null) {
      TDigestAggregator proto = new TDigestAggregator(delta, 16);
      buf.state = proto.zero();
      buf.state.promote(); // empty map → digest mode
    } else if (buf.state.delta != delta) {
      throw new IllegalArgumentException("t-digest delta differs");
    }
    if (total == 0 || n == 0) return; // empty digest: python merge skips it
    for (int i = 0; i < n; i++) {
      double mean = bb.getDouble(36 + 8 * i);
      double w = bb.getDouble(36 + 8 * (int) n + 8 * i);
      buf.state.addWeighted(mean, w);
    }
    // addWeighted tracked extremes of the MEANS; restore the true raw-data
    // extremes the blob carries (python merge keeps min/max of vmin/vmax)
    if (vmin < buf.state.vmin) buf.state.vmin = vmin;
    if (vmax > buf.state.vmax) buf.state.vmax = vmax;
  }

  @Override
  public Buf zero() {
    return new Buf();
  }

  @Override
  public Buf reduce(Buf buf, byte[] blob) {
    if (blob == null) return buf;
    mergeBlob(buf, blob);
    return buf;
  }

  @Override
  public Buf merge(Buf a, Buf c) {
    if (c.state == null) return a;
    if (a.state == null) return c;
    if (a.state.delta != c.state.delta) {
      // TDigestAggregator.merge never compares delta (its buffers share
      // the constructor's); cross-partition buffers adopt their own, so
      // the refusal must happen HERE too, like the reduce path
      throw new IllegalArgumentException("t-digest delta differs");
    }
    new TDigestAggregator(a.state.delta, a.state.exactCap).merge(a.state, c.state);
    return a;
  }

  /** Emits TDigestAggregator's intermediate blob (mode 1 digest — reused
   *  Python finalize _td_blob_to_bytes); an uninitialized buffer emits the
   *  mode-0 n=0 form → SQL NULL. */
  @Override
  public byte[] finish(Buf buf) {
    if (buf.state == null) {
      ByteBuffer bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN);
      bb.put((byte) 1).put((byte) 0).putShort((short) 100).putInt(0);
      return bb.array();
    }
    return new TDigestAggregator(buf.state.delta, buf.state.exactCap).finish(buf.state);
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
