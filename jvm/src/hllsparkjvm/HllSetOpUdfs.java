package hllsparkjvm;

import org.apache.spark.sql.api.java.UDF2;

/**
 * Pairwise set-operation estimates over STORED canonical counters, entirely
 * in the JVM — the reference's inclusion–exclusion read surface
 * (hyperloglog_union / intersection / compliment / symmetric_diff,
 * hyperloglog_counter.c:1051-1193, SQL surface postgres.sql:131-160) over
 * sketch rollup tables without a pandas decode per row.
 *
 * Each operand is decoded with {@link HllMergeAggregator#mergeBlob} (all
 * v1/v2 canonical payload forms: raw/group-varint sparse,
 * raw/bit-packed/deflated dense); the union state reuses the same decoder
 * twice into one buffer, so parameter- and hash-kind-mismatch refusals are
 * identical to the merge aggregator's.  Estimates use {@link HllEstimator}
 * (StrictMath.log — parity contract: bit-exact vs the pandas path outside
 * the linear-counting regimes, ≤1 ulp inside them), and the
 * inclusion–exclusion arithmetic replays the Python operation order
 * exactly (core/hll.py:603-620):
 *
 *   union           = est(A∪B)
 *   intersection    = est(A) + est(B) − est(A∪B)
 *   compliment      = est(A∪B) − est(B)            [reference spelling]
 *   symmetric_diff  = 2·est(A∪B) − est(A) − est(B)
 *
 * NULL contract mirrors functions._pairwise(null_passthrough=True): both
 * operands NULL → NULL; one NULL → the union estimates the surviving side,
 * the difference forms return 0.0 (the reference treats a NULL counter as
 * the empty set in these operators).
 *
 * Counter-valued union (the {@code ||} operator returning a mergeable
 * sketch, not an estimate) stays pandas-side (functions.hll_union): its
 * output must be CANONICAL bytes, and canonical encoding (sorted sparse
 * group-varint / bit-packed dense, core/hll.py to_bytes) is deliberately
 * implemented once, in Python.  In-JVM bulk merging of counters is the
 * aggregate form (HllMergeAggregator).
 */
public final class HllSetOpUdfs {
  private HllSetOpUdfs() {}

  static double estimate(HllRegisterAggregator.Buf st) {
    if (st.dense != null) return HllEstimator.estimateDense(st.dense, st.b, st.binbits);
    return HllEstimator.estimateSparse(st.n, st.binbits);
  }

  static double estOne(byte[] blob) {
    HllMergeAggregator.Buf buf = new HllMergeAggregator.Buf();
    HllMergeAggregator.mergeBlob(buf, blob);
    return estimate(buf.state);
  }

  static double estUnion(byte[] a, byte[] b) {
    HllMergeAggregator.Buf buf = new HllMergeAggregator.Buf();
    HllMergeAggregator.mergeBlob(buf, a);
    HllMergeAggregator.mergeBlob(buf, b);
    return estimate(buf.state);
  }

  /** est(A∪B); one NULL operand → est(other), both NULL → NULL. */
  public static final class UnionEstimate implements UDF2<byte[], byte[], Double> {
    private static final long serialVersionUID = 1L;

    public UnionEstimate() {}

    @Override
    public Double call(byte[] a, byte[] b) {
      if (a == null && b == null) return null;
      if (a == null) return estOne(b);
      if (b == null) return estOne(a);
      return estUnion(a, b);
    }
  }

  /** est(A) + est(B) − est(A∪B); any NULL operand → 0.0, both NULL → NULL. */
  public static final class IntersectionEstimate implements UDF2<byte[], byte[], Double> {
    private static final long serialVersionUID = 1L;

    public IntersectionEstimate() {}

    @Override
    public Double call(byte[] a, byte[] b) {
      if (a == null && b == null) return null;
      if (a == null || b == null) return 0.0;
      return estOne(a) + estOne(b) - estUnion(a, b);
    }
  }

  /** est(A∪B) − est(B); any NULL operand → 0.0, both NULL → NULL. */
  public static final class ComplimentEstimate implements UDF2<byte[], byte[], Double> {
    private static final long serialVersionUID = 1L;

    public ComplimentEstimate() {}

    @Override
    public Double call(byte[] a, byte[] b) {
      if (a == null && b == null) return null;
      if (a == null || b == null) return 0.0;
      return estUnion(a, b) - estOne(b);
    }
  }

  /** 2·est(A∪B) − est(A) − est(B); any NULL operand → 0.0, both NULL → NULL. */
  public static final class SymmetricDiffEstimate implements UDF2<byte[], byte[], Double> {
    private static final long serialVersionUID = 1L;

    public SymmetricDiffEstimate() {}

    @Override
    public Double call(byte[] a, byte[] b) {
      if (a == null && b == null) return null;
      if (a == null || b == null) return 0.0;
      return 2.0 * estUnion(a, b) - estOne(a) - estOne(b);
    }
  }
}
