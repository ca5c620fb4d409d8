"""In-JVM estimate finalize (HllBlobEstimateUdf / HllEstimator): parity with
the pandas finalize across modes, precisions, chain rows and the v2
stored-merge path, plus the all-JVM plan shape it exists for.

Parity contract (HllEstimator.java header): bit-identical wherever no log
is taken (bias-corrected dense regime); ≤ 1 ulp in the linear-counting
regimes, where the JVM's StrictMath.log (fdlibm, chosen so results can't
flip across JIT tiers) may differ from CPython's platform libm in the last
bit.  Both are far inside the 10-decimal golden tolerance and the
micro-unit (×1e6) contract compare, which is asserted here too.
"""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hllspark import agg
from hllspark.core.hll import HASH_XXHASH_SPARK, HLL, sparse_capacity

ju = pytest.importorskip("hllspark.jvm_udaf")


@pytest.fixture(scope="module")
def udaf_spark(spark):
    if not ju.available(spark):
        pytest.skip("hllspark-udaf.jar not loadable (no JDK?)")
    if ju._estimate_udf_column(spark, F.lit(None).cast("binary")) is None:
        pytest.skip("jar predates HllBlobEstimateUdf (version skew)")
    return spark


def _close1ulp(a, b):
    if a is None or b is None:
        return a is b
    return a == b or abs(a - b) <= math.ulp(max(abs(a), abs(b)))


def _pandas_estimate(spark, agged):
    return agged.select(ju._finalize_udf("estimate")(F.col("__blob")).alias("est")).first()["est"]


@pytest.mark.parametrize("b,binbits", [(14, 6), (4, 4), (11, 5), (18, 8), (16, 7)])
def test_jvm_estimate_parity_sweep(udaf_spark, b, binbits):
    """Sparse, boundary, dense and bias-corrected cardinalities at five
    precision shapes (incl. the b>16 alpham formula branch and both
    binbits register-term branches) — every estimate within 1 ulp of the
    pandas finalize and equal at contract micro-units."""
    for n in [0, 1, 5, 100, 1020, 1021, 5000, 60000]:
        df = udaf_spark.range(n).select((F.col("id") * 7919).alias("v"))
        jv = ju.sketch_jvm_udaf(df, "v", b=b, binbits=binbits, finalize="estimate").first()["est"]
        acol = ju.hll_udaf_column(udaf_spark, agg.jvm_hash_expr(df, "v"), b, binbits)
        agged = df.groupBy().agg(acol.alias("__blob"))
        pv = _pandas_estimate(udaf_spark, agged)
        assert _close1ulp(jv, pv), (n, jv, pv)
        if jv is not None:
            assert round(jv * 1e6) == round(pv * 1e6), (n, jv, pv)


def test_jvm_estimate_plan_has_no_python_stage(udaf_spark):
    """The point of the JVM finalize: scan → xxhash64 → ObjectHashAggregate
    → JVM scalar UDF, with no Arrow transfer and no Python worker — for
    both the global and the grouped estimate query."""
    df = udaf_spark.range(10_000).select((F.col("id") % 7).alias("g"), F.col("id").alias("v"))
    for q in [
        ju.sketch_jvm_udaf(df, "v", finalize="estimate"),
        ju.sketch_jvm_udaf(df, "v", ["g"], finalize="estimate_bigint"),
    ]:
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_jvm_estimate_null_contract(udaf_spark):
    """All-NULL group → SQL NULL estimate (and 0 for estimate_bigint);
    NULL group KEYS aggregate normally — same contract as every engine."""
    rows = [Row(g=None, v=1), Row(g=None, v=2), Row(g="a", v=None), Row(g="b", v=5), Row(g="b", v=6)]
    df = udaf_spark.createDataFrame(rows)
    est = {r["g"]: r["est"] for r in ju.sketch_jvm_udaf(df, "v", ["g"], finalize="estimate").collect()}
    assert est["a"] is None and est[None] is not None and est["b"] is not None
    big = {r["g"]: r["est"] for r in ju.sketch_jvm_udaf(df, "v", ["g"], finalize="estimate_bigint").collect()}
    assert big == {None: 2, "a": 0, "b": 2}


def test_jvm_estimate_chain_replay_parity(udaf_spark):
    """Crafted suffix==0 hashes exercise the in-JVM murmur rehash chain
    (HllEstimator.rhoChain/encodeHash/denseAdd) in sparse, dense and
    promote-during-replay shapes — parity with the Python chain replay."""
    b, binbits = 14, 6
    cap = sparse_capacity(b)
    rng = np.random.RandomState(7)

    def rand(k):
        return rng.randint(-(2**63), 2**63, size=k, dtype=np.int64)

    chain_rows = np.arange(1, 6, dtype=np.int64) << 39  # h << pprime == 0
    cases = {
        "chains_sparse": np.concatenate([rand(100), chain_rows]),
        "chains_dense": np.concatenate([rand(cap * 40), chain_rows, np.zeros(1, dtype=np.int64)]),
        "chains_promote": np.concatenate([rand(cap - 2), chain_rows]),
    }
    for name, hs in cases.items():
        sdf = udaf_spark.createDataFrame([(int(x),) for x in hs], "h long").repartition(4)
        col = ju.hll_udaf_column(udaf_spark, F.col("h"), b, binbits)
        agged = sdf.groupBy().agg(col.alias("__blob"))
        jv = agged.select(ju._estimate_udf_column(udaf_spark, F.col("__blob")).alias("est")).first()["est"]
        pv = _pandas_estimate(udaf_spark, agged)
        assert _close1ulp(jv, pv), (name, jv, pv)


def test_jvm_estimate_v2_merge_path(udaf_spark):
    """hll_merge_udaf(finalize="estimate") — the stored-sketch rollup path —
    runs the v2 intermediate blob through the same JVM estimator; an EMPTY
    stored counter survives as estimate 0.0 (NOT NULL: the v2 b==0 marker
    alone means all-NULL)."""
    df = udaf_spark.range(3000).select((F.col("id") % 17).alias("g"), F.col("id").alias("v"))
    stored = ju.sketch_jvm_udaf(df, "v", ["g"])
    # (no plan assertion here: the upstream `stored` build serializes
    # canonical sketches through the pandas finalize by design, so the
    # composed plan legitimately contains that Arrow stage)
    q = ju.hll_merge_udaf(stored, "sketch", finalize="estimate")
    jv = q.first()["est"]
    acol = ju._sibling_udaf_column(
        udaf_spark, F.col("sketch"), "hllsparkjvm.HllMergeAggregator", [], encoder="binary"
    )
    pv = _pandas_estimate(udaf_spark, stored.groupBy().agg(acol.alias("__blob")))
    assert _close1ulp(jv, pv)

    empty = HLL.create(b=14, binbits=6, hash_kind=HASH_XXHASH_SPARK).to_bytes()
    edf = udaf_spark.createDataFrame([(bytearray(empty),)], "sketch binary")
    assert ju.hll_merge_udaf(edf, "sketch", finalize="estimate").first()["est"] == 0.0


@pytest.fixture(scope="module")
def sketch_est_spark(udaf_spark):
    try:
        ju.hll_estimate_col(udaf_spark, F.lit(None).cast("binary"))
    except RuntimeError:
        pytest.skip("jar predates HllSketchEstimateUdf (version skew)")
    return udaf_spark


def test_sketch_estimate_col_payload_forms(sketch_est_spark):
    """Per-row in-JVM estimate of STORED canonical counters matches the
    pandas reader (functions.hll_estimate) across EVERY serialization the
    library emits — raw + group-varint sparse, raw + bit-packed + deflated
    dense — plus NULL→NULL and empty-counter→0.0."""
    spark = sketch_est_spark
    df = spark.range(50_000).select((F.col("id") % 6).alias("g"), (F.col("id") * 13).alias("v"))
    # 6 groups of ~8.3k values: dense registers; plus small groups for sparse
    small = spark.range(40).select((F.col("id") % 4 + 10).alias("g"), F.col("id").alias("v"))
    stored = ju.sketch_jvm_udaf(df.unionAll(small), "v", ["g"]).collect()
    blobs = []
    for r in stored:
        h = HLL.from_bytes(bytes(r["sketch"]))
        blobs.append(h.to_bytes(packed=False, compress=False))  # raw sparse / raw dense
        blobs.append(h.to_bytes(packed=True, compress=False))   # bit-packed dense (no-op for sparse)
        blobs.append(h.to_bytes(compress=True))                 # varint sparse / deflated dense
    blobs.append(HLL.create(b=14, binbits=6, hash_kind=HASH_XXHASH_SPARK).to_bytes())  # empty
    rows = [(i, bytearray(b)) for i, b in enumerate(blobs)] + [(len(blobs), None)]
    sdf = spark.createDataFrame(rows, "i int, sketch binary").repartition(3)
    got = sdf.select("i", ju.hll_estimate_col(spark, F.col("sketch")).alias("jv")).collect()
    import hllspark.functions as hf

    pv_rows = sdf.select("i", hf.hll_estimate(F.col("sketch")).alias("pv")).collect()
    pv = {r["i"]: r["pv"] for r in pv_rows}
    assert len(got) == len(blobs) + 1
    for r in got:
        assert _close1ulp(r["jv"], pv[r["i"]]), (r["i"], r["jv"], pv[r["i"]])
    by_i = {r["i"]: r["jv"] for r in got}
    assert by_i[len(blobs) - 1] == 0.0  # empty stored counter
    assert by_i[len(blobs)] is None  # SQL NULL sketch


def test_sketch_estimate_col_plan_is_all_jvm(sketch_est_spark, tmp_path):
    """The read path this UDF exists for — scan a stored sketch-rollup table
    → estimate — must contain no Python/Arrow stage at all (the build side
    may; that's the write-time cost, paid once)."""
    spark = sketch_est_spark
    df = spark.range(1000).select((F.col("id") % 9).alias("g"), F.col("id").alias("v"))
    path = str(tmp_path / "rollup")
    ju.sketch_jvm_udaf(df, "v", ["g"]).write.parquet(path)
    q = spark.read.parquet(path).select("g", ju.hll_estimate_col(spark, F.col("sketch")).alias("est"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    ests = {r["g"]: r["est"] for r in q.collect()}
    assert len(ests) == 9 and all(6 <= e <= 140 for e in ests.values())


def test_sketch_estimate_col_refuses_non_canonical(sketch_est_spark):
    """A blob whose header is not a canonical hllspark counter (e.g. a
    reference-legacy wire blob, whose negative-b compressed flag form or
    PGLZ payload this UDF deliberately does not decode) fails the task
    LOUDLY instead of returning a wrong estimate."""
    spark = sketch_est_spark
    bad = bytes([1, 0x80, 6, 0, 0, 0, 0, 0]) + b"\x00" * 16  # b=-128: legacy/corrupt
    bdf = spark.createDataFrame([(bytearray(bad),)], "sketch binary")
    with pytest.raises(Exception, match="not a canonical hllspark counter"):
        bdf.select(ju.hll_estimate_col(spark, F.col("sketch")).alias("e")).collect()


def test_sketch_estimate_col_no_jar_is_loud(sketch_est_spark, monkeypatch):
    """Explicit-engine semantics: unlike the auto routes, a missing jar (or
    version skew) raises RuntimeError instead of silently degrading."""
    monkeypatch.setattr(ju, "_new_jvm_obj", lambda *a, **k: None)
    with pytest.raises(RuntimeError, match="HllSketchEstimateUdf"):
        ju.hll_estimate_col(sketch_est_spark, F.lit(None).cast("binary"))


def test_jvm_estimate_bit_exact_in_bias_corrected_regime(udaf_spark):
    """Where no logarithm is taken (dense, past the linear-counting
    threshold) the JVM estimate must be BIT-identical — the harmonic sum,
    float32 alpham and OLS bias fit replicate the Python operation order
    exactly.  n=60000 at b=14 sits in that regime (threshold 11500)."""
    df = udaf_spark.range(60_000).select((F.col("id") * 31) .alias("v"))
    jv = ju.sketch_jvm_udaf(df, "v", finalize="estimate").first()["est"]
    acol = ju.hll_udaf_column(udaf_spark, agg.jvm_hash_expr(df, "v"), 14, 6)
    pv = _pandas_estimate(udaf_spark, df.groupBy().agg(acol.alias("__blob")))
    assert jv == pv
