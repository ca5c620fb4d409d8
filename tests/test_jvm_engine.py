"""JVM-native engine: bit-exact expression parity with the numpy kernels and
byte-identical sketches vs the python (mapInArrow) engine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hllspark import agg
from hllspark.core.hash import clz64
from hllspark.core.hll import encode_hashes


def test_jvm_expressions_bit_exact(spark):
    df = spark.range(0, 100_000).select(F.xxhash64("id").alias("h"))
    idx, rho, enc, chain = agg._jvm_exprs(F.col("h"), 14, 6)
    rows = df.select("h", idx.alias("i"), rho.alias("r"), enc.alias("e")).collect()
    hs = np.array([r["h"] for r in rows], dtype=np.int64).view(np.uint64)
    assert np.array_equal((hs >> np.uint64(50)).astype(np.int64), np.array([r["i"] for r in rows]))
    assert np.array_equal(clz64(hs << np.uint64(14)).astype(np.int64) + 1, np.array([r["r"] for r in rows]))
    assert np.array_equal(encode_hashes(hs, 14, 6).astype(np.int64), np.array([r["e"] for r in rows]))


def _bytes_by_key(df, by):
    return {tuple(r[c] for c in by): bytes(r["sketch"]) for r in df.collect()}


def test_jvm_engine_byte_parity_strings(spark):
    pages = spark.read.parquet("/root/repo/data/pages_small")
    py = _bytes_by_key(agg.sketch(pages, "url", by=["lang"], engine="python", jvm_prehash=True), ["lang"])
    jvm = _bytes_by_key(agg.sketch_jvm(pages, "url", by=["lang"]), ["lang"])
    assert py == jvm


def test_jvm_engine_byte_parity_global_and_longs(spark, sf01_dir):
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    # longs: python engine with jvm_prehash=True hashes via xxhash64 too
    py = bytes(agg.sketch(li, "l_orderkey", engine="python", jvm_prehash=True).first()["sketch"])
    jvm = bytes(agg.sketch_jvm(li, "l_orderkey").first()["sketch"])
    assert py == jvm


def test_jvm_engine_sparse_keys_and_nulls(spark):
    # small distinct counts per key → sparse representation, plus a NULL-only key
    df = spark.createDataFrame(
        [(g, f"v{i % (10 * (g + 1))}") for g in range(3) for i in range(500)] + [(9, None)] * 5,
        "g int, v string",
    )
    py = _bytes_by_key(agg.sketch(df, "v", by=["g"], engine="python", jvm_prehash=True), ["g"])
    jvm = _bytes_by_key(agg.sketch_jvm(df, "v", by=["g"]), ["g"])
    assert py == jvm
    from hllspark.core.hll import HLL

    assert HLL.from_bytes(jvm[(0,)]).is_sparse  # 10 distinct → sparse
    assert HLL.from_bytes(jvm[(9,)]).estimate() == 0.0  # all-null group present, empty


def test_jvm_engine_sparse_dense_boundary(spark):
    # straddle the 1020-capacity promotion edge
    for n, sparse in ((1000, True), (1500, False)):
        df = spark.range(n).select(F.col("id").cast("string").alias("v"))
        py = bytes(agg.sketch(df, "v", engine="python", jvm_prehash=True).first()["sketch"])
        jvm = bytes(agg.sketch_jvm(df, "v").first()["sketch"])
        assert py == jvm
        from hllspark.core.hll import HLL

        h = HLL.from_bytes(jvm)
        # n distinct strings may collide in the 2^25 encode space very rarely;
        # representation must match the canonical rule exactly
        assert h.is_sparse == (len(h.sparse) <= 1020 if h.sparse is not None else False) or not sparse


def test_distinct_auto_uses_jvm_and_matches_exact(spark, sf01_dir):
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).first()[0]
    est = agg.distinct(li, "l_orderkey").first()["est"]  # auto → jvm engine
    assert abs(est - exact) / exact < 3 * 1.04 / (2**14) ** 0.5


def test_countmin_bloom_jvm_byte_parity(spark, sf01_dir):
    """JVM-native count-min/bloom builders produce byte-identical sketches to
    the python engine with jvm_prehash=True."""
    from hllspark.core.hll import HASH_XXHASH_SPARK
    from hllspark.sketches import Bloom, CountMin
    from hllspark.sketches.jvm import bloom_jvm, countmin_jvm

    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    py_cm = _bytes_by_key(
        agg.sketch_generic(
            li, "l_partkey",
            lambda: CountMin.create(width=1024, depth=4, hash_kind=HASH_XXHASH_SPARK),
            CountMin, by=["l_returnflag"], jvm_prehash=True,
        ), ["l_returnflag"],
    )
    jv_cm = _bytes_by_key(countmin_jvm(li, "l_partkey", by=["l_returnflag"], width=1024, depth=4), ["l_returnflag"])
    assert py_cm == jv_cm

    py_bf = _bytes_by_key(
        agg.sketch_generic(
            li, "l_suppkey",
            lambda: Bloom.create(m_bits=1 << 16, k=5, hash_kind=HASH_XXHASH_SPARK),
            Bloom, jvm_prehash=True,
        ), [],
    )
    jv_bf = _bytes_by_key(bloom_jvm(li, "l_suppkey", m_bits=1 << 16, k=5), [])
    assert py_bf == jv_bf


def test_distributed_assembly_byte_parity(spark, sf01_dir):
    """sketch_jvm_distributed (unbounded key cardinality) must match the
    driver-assembled sketch_jvm byte-for-byte, including sparse keys, the
    promotion boundary, and null-only groups."""
    pages = spark.read.parquet("/root/repo/data/pages_small")
    a = _bytes_by_key(agg.sketch_jvm(pages, "url", by=["lang"]), ["lang"])
    b = _bytes_by_key(agg.sketch_jvm_distributed(pages, "url", by=["lang"]), ["lang"])
    assert a == b

    # sparse keys + a null-only group
    df = spark.createDataFrame(
        [(g, f"v{i % (8 * (g + 1))}") for g in range(4) for i in range(400)] + [(9, None)] * 3,
        "g int, v string",
    )
    a = _bytes_by_key(agg.sketch_jvm(df, "v", by=["g"]), ["g"])
    b = _bytes_by_key(agg.sketch_jvm_distributed(df, "v", by=["g"]), ["g"])
    assert a == b

    # high-cardinality grouping: one tiny sketch per customer
    o = spark.read.parquet(f"{sf01_dir}/orders.parquet")
    a = _bytes_by_key(agg.sketch_jvm(o, "o_orderkey", by=["o_custkey"]), ["o_custkey"])
    b = _bytes_by_key(agg.sketch_jvm_distributed(o, "o_orderkey", by=["o_custkey"]), ["o_custkey"])
    assert a == b and len(a) > 500
