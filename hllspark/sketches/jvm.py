"""JVM-native builders for count-min and Bloom: like agg.sketch_jvm, the
entire reduction runs as whole-stage-codegen Catalyst aggregates — Python
only assembles the final ≤ d×w (or m/8-byte) state per key.

count-min:  xxhash64 → explode depth rows → pmod(h1 + j*h2, width)
            → groupBy(key, j, bucket).count()        [≤ d×w rows/key shuffle]
bloom:      same positions → DISTINCT (key, j, bit)  [≤ k×m' rows/key]

Both produce byte-identical sketches to the python engine with
jvm_prehash=True (hash_kind=HASH_XXHASH_SPARK) — tested in
tests/test_jvm_engine.py — because the double-hash arithmetic
(h1 + j*h2 with h1, h2 < 2^32) never wraps in a signed 64-bit long.

Narrow integral value columns are canonicalized to LongType before hashing
(agg.jvm_hash_expr) so Python-side probes (cm_query / bloom_contains), which
cannot see the SQL type, hash in the same domain.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from ..core.hll import HASH_XXHASH_SPARK
from .bloom import Bloom
from .countmin import CountMin


def _positions_exprs(hcol, n_rows: int, modulo: int):
    """List of bucket-position expressions (h1 + j*h2) % modulo for each row j."""
    # same split as the python kernels: h1 = h & 0xFFFFFFFF, h2 = (h >>> 32) | 1
    h1 = hcol.bitwiseAND(F.lit(0xFFFFFFFF))
    h2 = F.shiftrightunsigned(hcol, 32).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(j) * h2, F.lit(modulo)) for j in range(n_rows)]


def countmin_jvm(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    width: int = 4096,
    depth: int = 5,
) -> DataFrame:
    """DataFrame[by..., sketch] of CountMin sketches, hot path fully JVM."""
    by = list(by or [])
    spark = df.sparkSession
    from ..agg import jvm_hash_expr

    hdf = df.select(*by, jvm_hash_expr(df, value_col).alias("__h")).filter(F.col("__h").isNotNull())
    pos = _positions_exprs(F.col("__h"), depth, width)
    cells = hdf.select(
        *by, F.explode(F.array(*[F.struct(F.lit(j).alias("j"), p.alias("bucket")) for j, p in enumerate(pos)])).alias("c")
    ).select(*by, F.col("c.j").alias("__j"), F.col("c.bucket").alias("__b"))
    counted = cells.groupBy(*by, "__j", "__b").count().toArrow().to_pandas()

    per_key: dict = {}
    keys_iter = zip(*(counted[c] for c in by)) if by else ((),) * len(counted)
    for k, j, bkt, cnt in zip(keys_iter, counted["__j"], counted["__b"], counted["count"]):
        k = tuple(k) if by else ()
        st = per_key.get(k)
        if st is None:
            st = per_key[k] = CountMin.create(width=width, depth=depth, hash_kind=HASH_XXHASH_SPARK)
        st.counts[int(j), int(bkt)] += np.uint64(cnt)
        if int(j) == 0:
            st.total += int(cnt)
    if not by and not per_key:
        per_key[()] = CountMin.create(width=width, depth=depth, hash_kind=HASH_XXHASH_SPARK)

    schema = StructType([df.schema[c] for c in by] + [StructField("sketch", BinaryType(), True)])
    rows = [(*k, sk.to_bytes()) for k, sk in sorted(per_key.items(), key=lambda kv: tuple(str(x) for x in kv[0]))]
    return spark.createDataFrame(rows, schema)


def bloom_jvm(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """DataFrame[by..., sketch] of Bloom filters, hot path fully JVM.

    n_added (an upper-bound diagnostic in merges) is the exact non-null row
    count here, matching the python builder fed the same rows at once."""
    by = list(by or [])
    spark = df.sparkSession
    from ..agg import jvm_hash_expr

    hdf = df.select(*by, jvm_hash_expr(df, value_col).alias("__h")).filter(F.col("__h").isNotNull())
    pos = _positions_exprs(F.col("__h"), k, m_bits)
    bits = (
        hdf.select(*by, F.explode(F.array(*pos)).alias("__bit"))
        .groupBy(*by, "__bit")
        .agg(F.count("*").alias("__n"))
        .toArrow()
        .to_pandas()
    )
    n_added = hdf.groupBy(*by).count().toArrow().to_pandas() if by else None
    total_n = hdf.count() if not by else None

    per_key: dict = {}
    keys_iter = zip(*(bits[c] for c in by)) if by else ((),) * len(bits)
    for kk, bit in zip(keys_iter, bits["__bit"]):
        kk = tuple(kk) if by else ()
        st = per_key.get(kk)
        if st is None:
            st = per_key[kk] = Bloom.create(m_bits=m_bits, k=k, hash_kind=HASH_XXHASH_SPARK)
        b = int(bit)
        st.bits[b >> 3] |= np.uint8(1 << (b & 7))
    if by and n_added is not None:
        for kk, cnt in zip(zip(*(n_added[c] for c in by)), n_added["count"]):
            kk = tuple(kk)
            if kk in per_key:
                per_key[kk].n_added = int(cnt)
            else:
                per_key[kk] = Bloom.create(m_bits=m_bits, k=k, hash_kind=HASH_XXHASH_SPARK)
    elif not by:
        if not per_key:
            per_key[()] = Bloom.create(m_bits=m_bits, k=k, hash_kind=HASH_XXHASH_SPARK)
        per_key[()].n_added = int(total_n or 0)

    schema = StructType([df.schema[c] for c in by] + [StructField("sketch", BinaryType(), True)])
    rows = [(*kk, sk.to_bytes()) for kk, sk in sorted(per_key.items(), key=lambda kv: tuple(str(x) for x in kv[0]))]
    return spark.createDataFrame(rows, schema)
