"""JVM-native builders for count-min and Bloom: like agg.sketch_jvm, the
entire reduction runs as whole-stage-codegen Catalyst aggregates — Python
only assembles the final ≤ d×w (or m-bit) state per key.

count-min:  xxhash64 → explode depth rows → pmod(h1 + j*h2, width)
            → groupBy(key, j, bucket).count()        [≤ d×w rows/key shuffle]
bloom:      same positions → groupBy(key, bit).count() [≤ m rows/key]

Grouped builds assemble DISTRIBUTED (applyInPandas per key → unbounded
group-key cardinality); the global build assembles its single bounded state
on the driver.  Both produce byte-identical sketches to the python engine
with jvm_prehash=True (hash_kind=HASH_XXHASH_SPARK) — tested in
tests/test_jvm_engine.py — because the double-hash arithmetic
(h1 + j*h2 with h1, h2 < 2^32) never wraps in a signed 64-bit long.

Narrow integral value columns are canonicalized to LongType before hashing
(agg.jvm_hash_expr) so Python-side probes (cm_query / bloom_contains), which
cannot see the SQL type, hash in the same domain.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructField, StructType

from ..core.hll import HASH_XXHASH_SPARK
from .bloom import Bloom
from .countmin import CountMin


def _positions_exprs(hcol, n_rows: int, modulo: int):
    """List of bucket-position expressions (h1 + j*h2) % modulo for each row j."""
    # same split as the python kernels: h1 = h & 0xFFFFFFFF, h2 = (h >>> 32) | 1
    h1 = hcol.bitwiseAND(F.lit(0xFFFFFFFF))
    h2 = F.shiftrightunsigned(hcol, 32).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(j) * h2, F.lit(modulo)) for j in range(n_rows)]


def _keyrow(pdf: pd.DataFrame, by: Sequence[str]) -> dict:
    """First row's key values, pandas-degraded NULLs → None (shared rule)."""
    from ..agg import pd_keyrow

    return pd_keyrow(pdf, by)


def _hashed(df: DataFrame, value_col: str, by: Sequence[str]) -> DataFrame:
    """NULL values keep a NULL hash: they must flow through the reduction as
    (key, NULL) rows so a group whose EVERY value is NULL still surfaces —
    and yields a SQL NULL sketch, the reference's strict-aggregate contract
    (hyperloglog_counter.c:511-513), matching the python engine's
    touched-keys rule (agg.py build_partials)."""
    from ..agg import jvm_hash_expr

    return df.select(*by, jvm_hash_expr(df, value_col).alias("__h"))


def _out_schema(df: DataFrame, by: Sequence[str]) -> StructType:
    from ..agg import _nullable_key_fields

    return StructType(_nullable_key_fields(df, by) + [StructField("sketch", BinaryType(), True)])


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
    hdf = _hashed(df, value_col, by)
    pos = _positions_exprs(F.col("__h"), depth, width)
    cells = hdf.select(
        *by, F.explode(F.array(*[F.struct(F.lit(j).alias("j"), p.alias("bucket")) for j, p in enumerate(pos)])).alias("c")
    ).select(*by, F.col("c.j").alias("__j"), F.col("c.bucket").alias("__b"))
    counted = cells.groupBy(*by, "__j", "__b").agg(F.count("*").alias("__n"))

    def build(pdf: pd.DataFrame) -> bytes | None:
        # NULL-valued rows arrive as NULL buckets; a key with zero non-NULL
        # values yields a SQL NULL sketch (reference strict-agg contract)
        valid = pdf["__b"].notna()
        if not valid.any():
            return None
        st = CountMin.create(width=width, depth=depth, hash_kind=HASH_XXHASH_SPARK)
        j = pdf.loc[valid, "__j"].to_numpy(np.float64).astype(np.int64)
        b = pdf.loc[valid, "__b"].to_numpy(np.float64).astype(np.int64)
        n = pdf.loc[valid, "__n"].to_numpy(np.float64).astype(np.int64)
        st.counts[j, b] = n.astype(np.uint64)  # (j, b) unique after groupBy
        st.total = int(n[j == 0].sum())  # every row lands exactly one j=0 cell
        return st.to_bytes()

    if not by:
        # global: the state is bounded (≤ d×w rows) — assemble on the driver
        pdf = counted.toArrow().to_pandas()
        return spark.createDataFrame([(build(pdf),)], _out_schema(df, []))

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({**_keyrow(pdf, by), "sketch": [build(pdf)]})

    return counted.groupBy(*by).applyInPandas(assemble, schema=_out_schema(df, by))


def bloom_jvm(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """DataFrame[by..., sketch] of Bloom filters, hot path fully JVM.

    ``n_added = sum(bit counts) / k`` is exact for ANY m: the explode emits
    exactly k position rows per input row (duplicates included), so the
    grouped counts always sum to k × rows.
    """
    by = list(by or [])
    spark = df.sparkSession
    hdf = _hashed(df, value_col, by)
    pos = _positions_exprs(F.col("__h"), k, m_bits)
    bits = (
        hdf.select(*by, F.explode(F.array(*pos)).alias("__bit"))
        .groupBy(*by, "__bit")
        .agg(F.count("*").alias("__n"))
    )

    def build(pdf: pd.DataFrame) -> bytes | None:
        valid = pdf["__bit"].notna()
        if not valid.any():
            return None  # all-NULL values → SQL NULL sketch
        bf = Bloom.create(m_bits=m_bits, k=k, hash_kind=HASH_XXHASH_SPARK)
        idx = pdf.loc[valid, "__bit"].to_numpy(np.float64).astype(np.int64)
        n = pdf.loc[valid, "__n"].to_numpy(np.float64).astype(np.int64)
        np.bitwise_or.at(bf.bits, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8)))
        bf.n_added = int(n.sum()) // k
        return bf.to_bytes()

    if not by:
        pdf = bits.toArrow().to_pandas()
        return spark.createDataFrame([(build(pdf),)], _out_schema(df, []))

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({**_keyrow(pdf, by), "sketch": [build(pdf)]})

    return bits.groupBy(*by).applyInPandas(assemble, schema=_out_schema(df, by))


def _value_counts(df: DataFrame, value_col: str, by: Sequence[str]) -> DataFrame:
    """groupBy(key, value).count() with the value canonicalized to double —
    the whole reduction is a Catalyst hash aggregate with map-side combine,
    so each partition ships at most its LOCAL distinct values.

    NULL (and NaN, which no quantile sketch ingests) values collapse to a
    single (key, NULL) row so all-NULL groups still surface downstream."""
    v = F.col(value_col).cast("double")
    v = F.when(F.isnan(v), F.lit(None)).otherwise(v)
    vals = df.select(*by, v.alias("__v"))
    return vals.groupBy(*by, "__v").agg(F.count("*").alias("__n"))


def _quantile_jvm(
    df: DataFrame, value_col: str, by: Sequence[str] | None, make, insert, presort: bool = True
) -> DataFrame:
    """Shared frame for tdigest_jvm / kll_jvm: JVM value-count reduction →
    one pandas finalize task per key, fed canonically SORTED (value, count)
    pairs so the sketch is a deterministic function of the value multiset
    (stronger than the python engine, whose result depends on partition
    batching).

    ``presort=True`` (both builders) sorts in the fold with numpy's fast
    introsort — byte-safe because the values are distinct here, see _fold —
    which for KLL IS the canonical-order guarantee (level buffers append in
    input order) and for TDigest turns its internal stable argsort into a
    ~free adaptive pass.  ``presort=False`` remains for insert functions
    that canonicalize order themselves on possibly-duplicated values.

    Scale envelope: the finalize task for a key sees that key's DISTINCT
    values.  Right-sized for discrete/low-cardinality numeric columns
    (quantities, prices, scores, sizes) — for genuinely continuous values
    use the python engine (agg.sketch_generic), which builds per partition
    and never shuffles values.
    """
    by = list(by or [])
    counted = _value_counts(df, value_col, by)

    def _fold(st, v: np.ndarray, n: np.ndarray) -> None:
        if presort:
            # shuffle order → canonical ascending order.  Introsort (default
            # kind), not stable: the values here are structurally DISTINCT
            # (this is groupBy(__v) output), so every correct sort is the
            # same permutation — and introsort measured 3× faster than the
            # stable sort at 8M doubles (the continuous-column fold task).
            order = np.argsort(v)
            v, n = v[order], n[order]
        insert(st, v, n)

    if by:
        def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
            valid = pdf["__v"].notna()
            if not valid.any():
                # zero ingestible values → SQL NULL sketch (strict-agg contract)
                return pd.DataFrame({**_keyrow(pdf, by), "sketch": [None]})
            st = make()
            v = pdf.loc[valid, "__v"].to_numpy(np.float64)
            n = pdf.loc[valid, "__n"].to_numpy(np.float64).astype(np.int64)
            _fold(st, v, n)
            return pd.DataFrame({**_keyrow(pdf, by), "sketch": [st.to_bytes()]})

        return counted.groupBy(*by).applyInPandas(assemble, schema=_out_schema(df, by))

    # global: ship the (value, count) rows through ONE exchange into a single
    # fold task via repartition(1) + mapInPandas.  The previous dummy-key
    # groupBy().applyInPandas moved the same rows but added the grouped-map
    # machinery (constant-key sort, whole-group materialization); mapInPandas
    # streams Arrow batches straight into numpy.
    g = "__g"
    sk_schema = StructType(
        [StructField(g, BooleanType(), False), StructField("sketch", BinaryType(), True)]
    )

    def fold_global(batches):
        vs: list[np.ndarray] = []
        ns: list[np.ndarray] = []
        for pdf in batches:
            vs.append(pdf["__v"].to_numpy(np.float64))
            ns.append(pdf["__n"].to_numpy(np.float64))
        if vs:
            v = np.concatenate(vs) if len(vs) > 1 else vs[0]
            n = np.concatenate(ns) if len(ns) > 1 else ns[0]
            # the NULL row from _value_counts' NaN/NULL collapse arrives as
            # numpy nan (pandas null→float64) — same drop as .notna()
            valid = ~np.isnan(v)
            if valid.any():
                if not valid.all():
                    v, n = v[valid], n[valid]
                st = make()
                _fold(st, v, n.astype(np.int64))
                yield pd.DataFrame({g: [True], "sketch": [st.to_bytes()]})
                return
        # all ingestible values NULL → one row with a SQL NULL sketch
        yield pd.DataFrame({g: [True], "sketch": [None]})

    out = counted.repartition(1).mapInPandas(fold_global, schema=sk_schema)
    # zero INPUT rows: AQE propagates the empty relation through the fold
    # (the Python task never runs), so restore the single NULL-sketch row
    # with a 1×≤1 broadcast join (aggregate-over-zero-rows contract)
    spark = df.sparkSession
    one = spark.range(1).select(F.lit(True).alias(g))
    return one.join(F.broadcast(out), on=g, how="left").drop(g)


def tdigest_jvm(df: DataFrame, value_col: str, by: Sequence[str] | None = None, delta: int = 100) -> DataFrame:
    """DataFrame[by..., sketch] of TDigest sketches; the only Python work is
    one weighted fold per key over pre-counted distinct values."""
    from .tdigest import TDigest

    return _quantile_jvm(
        df, value_col, by,
        lambda: TDigest.create(delta=delta),
        lambda st, v, n: st.update_weighted(v, n.astype(np.float64)),
        # presort with _fold's fast introsort: update_weighted's internal
        # STABLE argsort is adaptive (~free) on already-sorted input, so the
        # pair costs ~introsort alone — vs the full-price stable sort it
        # would otherwise run on shuffle-ordered values.  Bytes unchanged
        # either way (same permutation on distinct values).
        presort=True,
    )


def kll_jvm(df: DataFrame, value_col: str, by: Sequence[str] | None = None, k: int = 200) -> DataFrame:
    """DataFrame[by..., sketch] of KLL sketches via lossless binary weight
    decomposition of the per-value counts."""
    from .kll import KLL

    return _quantile_jvm(
        df, value_col, by,
        lambda: KLL.create(k=k),
        lambda st, v, n: st.update_weighted(v, n),
    )


_SMIN = -(1 << 63)


def minhash_jvm(df: DataFrame, value_col: str, by: Sequence[str] | None = None, k: int = 128) -> DataFrame:
    """DataFrame[by..., sketch] of MinHash signatures with the ENTIRE
    reduction in whole-stage-codegen JVM:

      xxhash64(value) → k derived hashes xxhash64(__h, lit(j)) (native,
      no wrapping multiplies — ANSI mode forbids overflow arithmetic)
      → groupBy(key).agg(k × min)

    Unsigned min order is preserved through Spark's signed longs by XORing
    the sign bit before the min and back after.  Python's only work is one
    vectorized row→bytes conversion per key.  Byte-identical to the python
    engine with jvm_prehash=True / hash_kind=HASH_XXHASH_SPARK, whose remix
    (minhash._remix_spark) replays the same xxhash64 chain (tested).

    A key (or a keyless aggregate) whose every value is NULL yields a SQL
    NULL sketch — the strict-aggregate contract shared by every engine.
    """
    from .minhash import MinHash

    by = list(by or [])
    hdf = _hashed(df, value_col, by)
    # xxhash64 SKIPS null inputs (folds only the remaining args) rather than
    # returning NULL — an unguarded NULL __h row would contribute a real
    # value and poison the min
    notnull = F.col("__h").isNotNull()
    agged = hdf.groupBy(*by).agg(
        *[
            F.min(F.when(notnull, F.xxhash64(F.col("__h"), F.lit(j)).bitwiseXOR(F.lit(_SMIN)))).alias(f"__m{j}")
            for j in range(1, k + 1)
        ],
        F.count("__h").alias("__n"),  # non-NULL values only
    )
    # un-flip the sign bit → true uint64 bit patterns, pack as one array col.
    # NULL mins (all-NULL groups, discarded below via __n == 0) are coalesced
    # to -1 (uint64 max, MinHash's empty-slot value) so the array column's
    # flat Arrow buffer NEVER contains nulls: pyarrow converts an
    # int64-with-nulls flat buffer to float64 for EVERY row in the batch,
    # which silently rounded the low bits of neighbouring groups' signatures
    # (caught by the round-4 udaf-parity test; the CLAUDE.md int64-null
    # degradation rule applies to list columns through their values buffer)
    sig_arr = F.array(
        *[F.coalesce(F.col(f"__m{j}").bitwiseXOR(F.lit(_SMIN)), F.lit(-1)) for j in range(1, k + 1)]
    )

    @F.pandas_udf(BinaryType())
    def to_sketch(sig: pd.Series, n: pd.Series) -> pd.Series:
        out = []
        for s, cnt in zip(sig, n):
            if int(cnt) == 0:
                out.append(None)
                continue
            a = np.asarray(s)
            if a.dtype != np.int64:  # loud guard: float degradation truncates hash bits
                raise TypeError(f"minhash signature batch degraded to {a.dtype}; expected int64")
            mh = MinHash(k, a.view(np.uint64).copy(), int(cnt), HASH_XXHASH_SPARK)
            out.append(mh.to_bytes())
        return pd.Series(out, dtype=object)

    return agged.select(*by, to_sketch(sig_arr, F.col("__n")).alias("sketch"))
