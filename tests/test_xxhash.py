"""Bit-exactness of the numpy XXH64 vs Spark's xxhash64, and hash-domain
interop: probing JVM-built sketches from Python."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hllspark.core.xxhash import xxh64_int, xxh64_long, xxh64_strings


def test_xxh64_matches_spark_vectors(spark):
    longs = [0, 1, 2, -1, 12345678901234, -(2**62)]
    got_spark = [
        r["h"] for r in spark.createDataFrame([(v,) for v in longs], "v long").select(F.xxhash64("v").alias("h")).collect()
    ]
    assert xxh64_long(longs).view(np.int64).tolist() == got_spark

    ints = [0, 1, 7, -5, 2**31 - 1]
    got_spark = [
        r["h"] for r in spark.createDataFrame([(v,) for v in ints], "v int").select(F.xxhash64("v").alias("h")).collect()
    ]
    assert xxh64_int(ints).view(np.int64).tolist() == got_spark

    strs = ["", "a", "abc", "abcdefgh", "x" * 31, "y" * 32, "z" * 33, "w" * 100, "é😀漢字" * 9, "q" * 64]
    got_spark = [
        r["h"]
        for r in spark.createDataFrame([(s,) for s in strs], "v string").select(F.xxhash64("v").alias("h")).collect()
    ]
    assert xxh64_strings(pd.Series(strs)).view(np.int64).tolist() == got_spark


def test_probe_jvm_built_sketches(spark, sf01_dir):
    """cm_query/bloom_contains must hit sketches built with jvm_prehash
    (hash_kind=1) by hashing the probe with the same xxhash64."""
    from hllspark import agg
    from hllspark.core.hll import HASH_XXHASH_SPARK
    from hllspark.functions import register_sql
    from hllspark.sketches import Bloom, CountMin

    register_sql(spark)
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    cm_df = agg.sketch_generic(
        li,
        "l_partkey",
        lambda: CountMin.create(width=4096, depth=5, hash_kind=HASH_XXHASH_SPARK),
        CountMin,
        jvm_prehash=True,
    )
    bf_df = agg.sketch_generic(
        li,
        "l_suppkey",
        lambda: Bloom.create(m_bits=1 << 20, k=7, hash_kind=HASH_XXHASH_SPARK),
        Bloom,
        jvm_prehash=True,
    )
    cm_df.createOrReplaceTempView("cmj")
    bf_df.createOrReplaceTempView("bfj")
    row = spark.sql(
        "SELECT cm_query(c.sketch, 77L) AS f77, "
        "bloom_contains(b.sketch, 5L) AS s5, "
        "bloom_contains(b.sketch, 999999999L) AS fake "
        "FROM cmj c CROSS JOIN bfj b"
    ).first()
    exact = li.filter(F.col("l_partkey") == 77).count()
    assert exact <= row["f77"] <= exact + 150
    assert row["s5"] is True and row["fake"] is False
