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


def test_legacy_v0_v1_reference_blobs():
    """hyperloglog_update parity: decode the reference's OWN v0/v1 hex
    fixtures (test/sql/update.sql:5-29) and reproduce every update.ref
    estimate to 10 decimals — PGLZ dense, bit-packed dense, raw sparse."""
    import re
    from pathlib import Path

    import pytest

    from hllspark.core.hll import HLL
    from hllspark.core.legacy import upgrade_bytes

    src = Path("/root/reference/test/sql/update.sql")
    if not src.exists():
        pytest.skip("reference fixtures not available")
    blobs = [bytes.fromhex(m) for m in re.findall(r"decode\(E'([0-9a-f]+)'", src.read_text())]
    assert len(blobs) == 5
    golden = [9998.4010348519, 9998.4010348519, 4.0000002384, 9998.4010348519, 9998.4010348519]
    for blob, g in zip(blobs, golden):
        upgraded = upgrade_bytes(blob)
        assert abs(HLL.from_bytes(upgraded).estimate() - g) < 5e-11
        # idempotent: upgrading an already-current blob is a no-op
        assert upgrade_bytes(upgraded) == upgraded


def test_hll_update_sql_surface(spark):
    import re
    from pathlib import Path

    import pytest

    from hllspark.functions import register_sql

    src = Path("/root/reference/test/sql/update.sql")
    if not src.exists():
        pytest.skip("reference fixtures not available")
    register_sql(spark)
    blobs = [bytes.fromhex(m) for m in re.findall(r"decode\(E'([0-9a-f]+)'", src.read_text())]
    df = spark.createDataFrame([(b,) for b in blobs], "legacy binary")
    rows = spark.sql("SELECT hll_estimate(hll_update(legacy)) AS e FROM {df}", df=df).collect()
    got = sorted(round(r["e"], 10) for r in rows)
    assert got == [4.0000002384] + [9998.4010348519] * 4
