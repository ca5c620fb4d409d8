"""Version-upgrade path (hyperloglog_update analogue, upgrade.c:24-60) and
base64 text casts (the reference's in/out functions, encoding.c:19-148)."""

import base64

import numpy as np
import pytest
from pyspark.sql import functions as F

from hllspark.core.hash import hash_int32
from hllspark.core.hll import HLL, STRUCT_VERSION


def make_sketch(n=5000):
    h = HLL.create()
    h.add_hashes(hash_int32(np.arange(n, dtype=np.int32)))
    return h


def test_older_version_blob_accepted():
    h = make_sketch()
    blob = bytearray(h.to_bytes())
    assert blob[0] == STRUCT_VERSION
    blob[0] = 1  # pretend an older writer produced it
    up = HLL.from_bytes(bytes(blob))
    assert up.estimate() == h.estimate()
    # re-serializing upgrades to the current version
    assert up.to_bytes()[0] == STRUCT_VERSION


def test_future_version_rejected():
    blob = bytearray(make_sketch().to_bytes())
    blob[0] = STRUCT_VERSION + 1
    with pytest.raises(ValueError, match="version"):
        HLL.from_bytes(bytes(blob))


def test_base64_text_cast_roundtrip(spark):
    """greenplum.sql:42-50 text casts ↔ base64(sketch) in Spark SQL."""
    from hllspark import agg
    from hllspark.functions import register_sql

    register_sql(spark)
    df = spark.range(1, 1001).select(F.col("id").alias("v"))
    sk = agg.sketch(df, "v")
    txt = sk.select(F.base64("sketch").alias("t"))
    row = txt.select(F.unbase64("t").alias("back")).select(F.expr("hll_estimate_bigint(back) AS est")).first()
    assert row["est"] == 1000  # sparse region: estimate rounds to exact

    # python-side parity with the same base64 payload
    t = txt.first()["t"]
    h = HLL.from_bytes(base64.b64decode(t))
    assert round(h.estimate()) == 1000
