package hllsparkjvm;

import org.apache.spark.sql.api.java.UDF1;

/**
 * Scalar UDF: STORED canonical hllspark counter → HLL++ estimate, entirely
 * in the JVM — the per-row {@code hyperloglog_get_estimate} / {@code #}
 * read path over sketch rollup tables (reference postgres.sql:112-114),
 * without the pandas decode per row.
 *
 * Decodes every v1/v2 canonical payload form via
 * {@link HllMergeAggregator#mergeBlob} (raw/group-varint sparse,
 * raw/bit-packed/deflated dense) and estimates with {@link HllEstimator}
 * (same parity contract: bit-exact outside the linear-counting regimes,
 * ≤1 ulp inside them).  NULL in → NULL out.
 *
 * Reference-LEGACY blobs (the Postgres reference's own v0/v1 wire format,
 * PGLZ-compressed dense — hllspark.core.legacy) are NOT decoded here and
 * raise IllegalArgumentException, failing the task loudly — the same
 * contract as the pandas reader (HLL.from_bytes): legacy blobs go through
 * hll_update first, exactly as the reference requires
 * (test/sql/update.sql).  jvm_udaf.hll_estimate_col documents the Python
 * surface; functions.hll_estimate remains the jar-free default.
 */
public final class HllSketchEstimateUdf implements UDF1<byte[], Double> {
  private static final long serialVersionUID = 1L;

  public HllSketchEstimateUdf() {}

  @Override
  public Double call(byte[] blob) {
    if (blob == null) return null;
    HllMergeAggregator.Buf buf = new HllMergeAggregator.Buf();
    HllMergeAggregator.mergeBlob(buf, blob);
    HllRegisterAggregator.Buf st = buf.state;
    if (st.dense != null) return HllEstimator.estimateDense(st.dense, st.b, st.binbits);
    return HllEstimator.estimateSparse(st.n, st.binbits);
  }
}
