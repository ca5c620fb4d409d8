package hllsparkjvm;

import org.apache.spark.sql.api.java.UDF1;

/**
 * Scalar UDF: udaf intermediate blob (HllRegisterAggregator /
 * HllMergeAggregator output) → HLL++ estimate, entirely in the JVM.
 *
 * Composed after the aggregators by jvm_udaf.sketch_jvm_udaf
 * (finalize="estimate"/"estimate_bigint") it removes the last Python stage
 * from the distinct-count query path: scan → xxhash64 →
 * ObjectHashAggregate(buffer) → this UDF — no Arrow transfer, no Python
 * worker.  Estimates are bit-identical to the pandas finalize
 * (jvm_udaf._blob_estimate; pinned by tests/test_jvm_estimate.py), and the
 * SQL NULL contract is preserved: NULL blob or v1 all-NULL group → null,
 * v2 uninitialized merge buffer (b==0) → null, v2 empty stored counter →
 * 0.0.
 */
public final class HllBlobEstimateUdf implements UDF1<byte[], Double> {
  private static final long serialVersionUID = 1L;

  public HllBlobEstimateUdf() {}

  @Override
  public Double call(byte[] blob) {
    if (blob == null) return null;
    return HllEstimator.estimateBlob(blob);
  }
}
