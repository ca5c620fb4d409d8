"""Scalar + simple-aggregate pandas UDFs over the sketch BinaryType column.

This is the SQL-facing surface mirroring the reference's scalar functions and
operators (sql/postgres.sql:43-330; see SURVEY.md §2.3-2.5):

| reference                              | here                               |
|----------------------------------------|------------------------------------|
| hyperloglog_get_estimate(c) / #c       | hll_estimate(sketch)               |
| hyperloglog_get_estimate_bigint(c)     | hll_estimate_bigint(sketch)        |
| hyperloglog_merge(c1,c2) / c1 || c2    | hll_union(a, b)                    |
| hyperloglog_union/intersection/…       | hll_union_estimate / …             |
| hyperloglog_equal / = / <>             | hll_equal(a, b)                    |
| length(c)                              | hll_length(sketch)                 |
| hyperloglog_info(c)                    | hll_info(sketch) → json string     |
| hyperloglog_accum(col) (agg)           | hll_sketch_agg(col) (GROUPED_AGG)  |
| hyperloglog_merge(col) (agg)           | hll_merge_agg(sketch_col)          |
| sum(counter) → bigint                  | hll_estimate_bigint(hll_merge_agg) |

NULL contract matches hyperloglog_counter.c:218-220/633-645: NULL inputs are
skipped, an all-NULL group yields NULL, merging NULL with a sketch returns
the sketch, and hll_estimate_bigint coalesces NULL→0.

The GROUPED_AGG UDAFs here are the *convenience* path: Spark gives pandas
aggregates no map-side partial aggregation, so they shuffle raw rows.  The
scale path is the explicit two-phase pipeline in hllspark.agg.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, IntegerType, LongType, StringType

from .core import hll as hllmod
from .core.hash import hash_float64, hash_int32, hash_int64, hash_strings
from .core.hll import HLL

DEFAULT_B = 14
DEFAULT_BINBITS = 6


def hash_series(s: pd.Series, input_type: str = "auto") -> np.ndarray:
    """Hash a (null-free) pandas Series with the reference's canonicalization:
    ints → little-endian datum bytes, floats → IEEE bytes, str → UTF-8,
    bytes → raw (hyperloglog_counter.c:536-547)."""
    if input_type == "auto":
        dt = s.dtype
        if pd.api.types.is_datetime64_any_dtype(dt):
            # canonicalize to epoch microseconds (Spark TimestampType unit)
            input_type = "int64"
            s = pd.Series(s.to_numpy().astype("datetime64[us]").view("int64"))
        elif pd.api.types.is_integer_dtype(dt):
            input_type = "int64"
        elif pd.api.types.is_float_dtype(dt):
            input_type = "float64"
        elif pd.api.types.is_bool_dtype(dt):
            input_type = "int32"
        else:
            input_type = "bytes"
    if input_type == "int32":
        return hash_int32(s.to_numpy(dtype=np.int64).astype(np.int32))
    if input_type == "int64":
        return hash_int64(s.to_numpy(dtype=np.int64))
    if input_type == "float64":
        return hash_float64(s.to_numpy(dtype=np.float64))
    if input_type == "bytes":
        return hash_strings(s)
    raise ValueError(f"unknown input_type {input_type!r}")


def build_sketch(s: pd.Series, b: int = DEFAULT_B, binbits: int = DEFAULT_BINBITS, input_type: str = "auto") -> HLL:
    """One sketch from a pandas Series (NULLs skipped)."""
    h = HLL.create(b=b, binbits=binbits)
    s = s.dropna()
    if len(s):
        h.add_hashes(hash_series(s, input_type))
    return h


# ---------------------------------------------------------------------------
# scalar UDFs (operate row-wise on serialized sketches; register work is numpy)
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())
def hll_estimate(sketch: pd.Series) -> pd.Series:
    """# operator / hyperloglog_get_estimate: NULL in → NULL out."""
    return sketch.map(lambda v: None if v is None else HLL.from_bytes(bytes(v)).estimate())


@pandas_udf(LongType())
def hll_estimate_bigint(sketch: pd.Series) -> pd.Series:
    """round(estimate)::bigint with NULL→0 (postgres.sql:169-171)."""
    return sketch.map(lambda v: 0 if v is None else int(round(HLL.from_bytes(bytes(v)).estimate()))).astype("int64")


def _pairwise(a: pd.Series, b: pd.Series, fn, null_passthrough: bool = True):
    out = []
    for x, y in zip(a, b):
        if x is None and y is None:
            out.append(None)
        elif x is None or y is None:
            if null_passthrough:
                one = HLL.from_bytes(bytes(x if x is not None else y))
                out.append(fn(one, None))
            else:
                out.append(None)
        else:
            out.append(fn(HLL.from_bytes(bytes(x)), HLL.from_bytes(bytes(y))))
    return out


@pandas_udf(BinaryType())
def hll_union(a: pd.Series, b: pd.Series) -> pd.Series:
    """c1 || c2 — register-max union; NULL merges to the other side."""
    def f(x, y):
        return x.to_bytes() if y is None else x.copy().merge(y).to_bytes()
    return pd.Series(_pairwise(a, b, f))


@pandas_udf(DoubleType())
def hll_union_estimate(a: pd.Series, b: pd.Series) -> pd.Series:
    def f(x, y):
        return x.estimate() if y is None else hllmod.union_estimate(x, y)
    return pd.Series(_pairwise(a, b, f), dtype="float64")


@pandas_udf(DoubleType())
def hll_intersection(a: pd.Series, b: pd.Series) -> pd.Series:
    def f(x, y):
        return 0.0 if y is None else hllmod.intersection_estimate(x, y)
    return pd.Series(_pairwise(a, b, f), dtype="float64")


@pandas_udf(DoubleType())
def hll_compliment(a: pd.Series, b: pd.Series) -> pd.Series:
    # [sic] — the reference spells complement this way (postgres.sql:143-145)
    def f(x, y):
        return 0.0 if y is None else hllmod.compliment_estimate(x, y)
    return pd.Series(_pairwise(a, b, f), dtype="float64")


@pandas_udf(DoubleType())
def hll_symmetric_diff(a: pd.Series, b: pd.Series) -> pd.Series:
    def f(x, y):
        return 0.0 if y is None else hllmod.symmetric_diff_estimate(x, y)
    return pd.Series(_pairwise(a, b, f), dtype="float64")


@pandas_udf(BooleanType())
def hll_equal(a: pd.Series, b: pd.Series) -> pd.Series:
    def f(x, y):
        return False if y is None else x.equals(y)
    return pd.Series(_pairwise(a, b, f, null_passthrough=False), dtype="boolean")


@pandas_udf(IntegerType())
def hll_length(sketch: pd.Series) -> pd.Series:
    return sketch.map(lambda v: None if v is None else len(v)).astype("Int32")


@pandas_udf(StringType())
def hll_info(sketch: pd.Series) -> pd.Series:
    return sketch.map(lambda v: None if v is None else json.dumps(HLL.from_bytes(bytes(v)).info()))


# ---------------------------------------------------------------------------
# GROUPED_AGG UDAFs (convenience path — raw-row shuffle; see hllspark.agg
# for the partial-aggregation scale path)
# ---------------------------------------------------------------------------


def make_sketch_agg(b: int = DEFAULT_B, binbits: int = DEFAULT_BINBITS, input_type: str = "auto"):
    """Factory for hyperloglog_accum-style GROUPED_AGG at a chosen precision."""

    @pandas_udf(BinaryType())
    def _sketch_agg(v: pd.Series) -> bytes:
        return build_sketch(v, b=b, binbits=binbits, input_type=input_type).to_bytes()

    return _sketch_agg


hll_sketch_agg = make_sketch_agg()


@pandas_udf(BinaryType())
def hll_merge_agg(sketches: pd.Series) -> bytes:
    """hyperloglog_merge aggregate over a stored sketch column."""
    acc: HLL | None = None
    for v in sketches:
        if v is None:
            continue
        s = HLL.from_bytes(bytes(v))
        acc = s if acc is None else acc.merge(s)
    return None if acc is None else acc.to_bytes()


def register_sql(spark, b: int = DEFAULT_B, binbits: int = DEFAULT_BINBITS) -> None:
    """Register the surface for use from spark.sql(...)."""
    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("hll_estimate_bigint", hll_estimate_bigint)
    spark.udf.register("hll_union", hll_union)
    spark.udf.register("hll_union_estimate", hll_union_estimate)
    spark.udf.register("hll_intersection", hll_intersection)
    spark.udf.register("hll_compliment", hll_compliment)
    spark.udf.register("hll_symmetric_diff", hll_symmetric_diff)
    spark.udf.register("hll_equal", hll_equal)
    spark.udf.register("hll_length", hll_length)
    spark.udf.register("hll_info", hll_info)
    spark.udf.register("hll_sketch_agg", make_sketch_agg(b, binbits))
    spark.udf.register("hll_sketch_agg_int32", make_sketch_agg(b, binbits, input_type="int32"))
    spark.udf.register("hll_merge_agg", hll_merge_agg)
