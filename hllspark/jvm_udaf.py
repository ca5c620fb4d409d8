"""JVM aggregate-buffer engines (`engine="jvm_udaf"` + sibling builders).

The HLL register reduction runs as a typed JVM Aggregator
(jvm/src/hllsparkjvm/HllRegisterAggregator.java); CountMin and Bloom have
sibling aggregate buffers in the same jar (countmin_jvm_udaf /
bloom_jvm_udaf, flat long[]/bitset buffers).  Registered through
``functions.udaf`` Spark wraps it in a ``ScalaAggregator``, which is a
``TypedImperativeAggregate``: one mutable buffer object per group, updated
in place per row inside ObjectHashAggregate — the flat-buffer shape of
Spark's DataSketches aggregates.  Compared to the groupBy(key, __idx)
register reduction (agg._hll_kernel_frames) this removes the per-row
composite-key hash-aggregate probe and the key×2^b intermediate row
explosion, which is the residual flat per-task cost that capped 8→32
scaling in round 2 (CLAUDE.md round-3 note).

Only the reduction is JVM; canonical serialization stays in Python: the
aggregator emits a small intermediate blob per group (mode, chain hashes,
encodings-or-registers) and ``_finalize_blob`` rebuilds the exact
``core.hll.HLL`` state, so output bytes are identical to the python and
groupBy-JVM engines by construction (tests/test_jvm_engine.py).

Availability: the session needs ``dist/hllspark-udaf.jar`` on the driver
classpath — ``configure_builder`` (session creation, preferred) or the
best-effort runtime ``ADD JAR`` + shared-classloader reflection fallback.
When neither works callers fall back to ``agg.sketch_jvm_distributed``.
On a real cluster ship the jar with ``spark.jars`` exactly like the
--py-files zip (tools/make_pyfiles.py docs).

Tuning: ObjectHashAggregate falls back to sort-based aggregation past
``spark.sql.objectHashAggregate.sortBased.fallbackThreshold`` in-memory
keys (default 128 — far too low for high-cardinality grouped sketches;
results stay exact either way, tests/test_jvm_udaf.py pins it).  Sessions
doing per-domain/per-user grouping should raise it (bench.py uses 65536).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_AGG_CLASS = "hllsparkjvm.HllRegisterAggregator"


def jar_path() -> str:
    """dist/hllspark-udaf.jar, compiled on demand when a JDK is present."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from build_jar import build  # type: ignore

        return str(build())
    finally:
        sys.path.pop(0)


def _to_col(jcol) -> Column:
    try:
        from pyspark.sql.classic.column import Column as _C  # pyspark >= 4

        return _C(jcol)
    except ImportError:  # pragma: no cover - pyspark 3.x
        return Column(jcol)


def _col_seq(spark: SparkSession, cols):
    from pyspark.sql.classic.column import _to_java_column, _to_seq

    return _to_seq(spark.sparkContext, cols, _to_java_column)


# app-key → ("direct", None) | ("loader", shared jar classloader) | ("none",
# None).  Keyed per Spark application (applicationId + startTime — NOT
# id(session), whose address a stopped session's successor can reuse, which
# would poison the cache and crash an auto-routed query instead of falling
# back).  Caching the RESOLVED path matters: without it, every query in an
# ADD-JAR-fallback session re-pays the failed py4j probe + a jar mtime scan
# + the reflection lookup.
_SESSION_CACHE: dict[str, tuple[str, object]] = {}


def _app_key(spark: SparkSession) -> str:
    sc = spark.sparkContext
    return f"{sc.applicationId}:{sc.startTime}"


def _resolve(spark: SparkSession) -> tuple[str, object]:
    """Find a working way to instantiate the jar's aggregators: (1) the py4j
    view (classes on the driver classpath via spark.jars), then (2) ADD JAR
    + the session's shared jar classloader via reflection."""
    jvm = spark._jvm
    try:
        probe = jvm.hllsparkjvm.HllRegisterAggregator(14, 6)
        probe.toString()  # py4j resolves unknown classes to a package stub
        return ("direct", None)
    except Exception:
        pass
    try:
        path = jar_path()
        spark.sql(f"ADD JAR '{path}'")
        loader = spark._jsparkSession.sharedState().jarClassLoader()
        # smoke one full instantiation so a broken path is never cached
        _reflect_new(spark, loader, _AGG_CLASS, [14, 6])
        return ("loader", loader)
    except Exception:
        return ("none", None)


def _reflect_new(spark: SparkSession, loader, cls_name: str, args: list):
    cls = loader.loadClass(cls_name)
    ctor = cls.getConstructors()[0]  # each aggregator class has exactly one
    jargs = spark.sparkContext._gateway.new_array(spark._jvm.java.lang.Object, len(args))
    for i, a in enumerate(args):
        jargs[i] = a
    return ctor.newInstance(jargs)


def _new_jvm_obj(spark: SparkSession, cls_name: str, args: list):
    """Instantiate any class from the udaf jar via the cached working path.

    Returns None when the jar isn't loadable in this session OR when THIS
    class is missing from the jar that did load (version skew: e.g. a
    cluster-deployed pre-round-3 jar has the HLL aggregator but not the
    CountMin/Bloom siblings) — callers surface their own helpful error or
    fall back, never a raw py4j 'JavaPackage not callable' crash.

    A session where nothing resolves is NOT negatively cached: the probe
    retries on the next call, so dropping a jar in (or installing a JDK)
    mid-application starts working without a SparkContext restart."""
    key = _app_key(spark)
    if key not in _SESSION_CACHE:
        resolved = _resolve(spark)
        if resolved[0] == "none":
            return None
        _SESSION_CACHE[key] = resolved
    mode, loader = _SESSION_CACHE[key]
    try:
        if mode == "direct":
            cls = spark._jvm
            for part in cls_name.split("."):
                cls = getattr(cls, part)
            obj = cls(*args)
            obj.toString()  # a missing class resolves to a py4j package stub
            return obj
        return _reflect_new(spark, loader, cls_name, args)
    except Exception:
        return None


def _new_aggregator(spark: SparkSession, b: int, binbits: int):
    return _new_jvm_obj(spark, _AGG_CLASS, [b, binbits])


def available(spark: SparkSession) -> bool:
    """Can this session run the JVM aggregate engine?  Positive results are
    cached per app; a failed resolve is retried next call (see
    _new_jvm_obj)."""
    key = _app_key(spark)
    if key in _SESSION_CACHE:
        return True
    resolved = _resolve(spark)
    if resolved[0] == "none":
        return False
    _SESSION_CACHE[key] = resolved
    return True


def configure_builder(builder, extra_jars: Sequence[str] = ()):
    """Add the UDAF jar to a SparkSession.Builder (call before getOrCreate).

    The clean path: spark.jars puts the class on both the driver's py4j
    classloader and the executor classpath (in any deploy mode).  APPENDS to
    any spark.jars the builder already carries (e.g. Iceberg runtime jars)
    instead of replacing them."""
    existing = []
    try:
        opts = getattr(builder, "_options", {})
        prior = opts.get("spark.jars")
        if prior:
            existing = [j for j in str(prior).split(",") if j]
    except Exception:
        pass
    jars = existing + [jar_path(), *extra_jars]
    # de-dup, order-preserving
    seen: dict[str, None] = {}
    for j in jars:
        seen.setdefault(j, None)
    return builder.config("spark.jars", ",".join(seen))


def hll_udaf_column(spark: SparkSession, hash_col: Column, b: int, binbits: int) -> Column:
    """Aggregate Column: intermediate blob of HLL state over a 64-bit hash
    column (NULL hashes are ignored; an all-NULL group → empty blob)."""
    jagg = _new_aggregator(spark, b, binbits)
    if jagg is None:
        raise RuntimeError(
            "hllspark-udaf.jar not loadable in this session; create the session "
            "with hllspark.jvm_udaf.configure_builder or use engine='jvm' "
            "(the no-jar groupBy engine; byte-identical sketches)"
        )
    jvm = spark._jvm
    judf = jvm.org.apache.spark.sql.functions.udaf(jagg, jvm.org.apache.spark.sql.Encoders.LONG())
    return _to_col(judf.apply(_col_seq(spark, [hash_col])))


def _blob_to_hll(buf):
    """Rebuild the exact core.hll.HLL state from the aggregator's blob
    (format: HllRegisterAggregator.finish docstring).  Returns None for the
    empty blob (all-NULL or zero-row group → SQL NULL, reference contract)."""
    from .core.hll import HASH_XXHASH_SPARK, HLL, sparse_capacity

    buf = bytes(buf)
    version, mode, b, binbits = buf[0], buf[1], buf[2], buf[3]
    if version != 1:
        raise ValueError(f"unknown udaf blob version {version}")
    nchain = int.from_bytes(buf[4:8], "little", signed=True)
    off = 8
    chains = np.frombuffer(buf, dtype="<i8", count=nchain, offset=off)
    off += 8 * nchain
    if mode == 0:
        n = int.from_bytes(buf[off : off + 4], "little", signed=True)
        off += 4
        encs = np.unique(np.frombuffer(buf, dtype="<u4", count=n, offset=off))
        if n == 0 and nchain == 0:
            return None
        if len(encs) > sparse_capacity(b):
            # can't arise from the aggregator (it promotes at >cap) but keep
            # the invariant locally enforced
            sk = HLL(b, binbits, encs, None, HASH_XXHASH_SPARK)
            sk._promote()
        else:
            sk = HLL(b, binbits, encs, None, HASH_XXHASH_SPARK)
    else:
        regs = np.frombuffer(buf, dtype=np.uint8, count=1 << b, offset=off).copy()
        sk = HLL(b, binbits, None, regs, HASH_XXHASH_SPARK)
    if nchain:
        sk.add_hashes(chains.view(np.uint64))
    return sk


def _finalize_udf(finalize: str):
    if finalize == "sketch":

        @pandas_udf("binary")
        def fin(blobs: pd.Series) -> pd.Series:
            return blobs.map(
                lambda v: None if v is None else (lambda sk: None if sk is None else sk.to_bytes())(_blob_to_hll(v))
            )

        return fin
    if finalize == "estimate":

        @pandas_udf("double")
        def fin(blobs: pd.Series) -> pd.Series:
            def est(v):
                sk = None if v is None else _blob_to_hll(v)
                return None if sk is None else sk.estimate()

            return blobs.map(est)

        return fin
    if finalize == "estimate_bigint":

        @pandas_udf("long")
        def fin(blobs: pd.Series) -> pd.Series:
            def est(v):
                sk = None if v is None else _blob_to_hll(v)
                return 0 if sk is None else int(round(sk.estimate()))

            return blobs.map(est)

        return fin
    raise ValueError(f"unknown finalize {finalize!r}")


def sketch_jvm_udaf(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    b: int | None = None,
    binbits: int | None = None,
    error_rate: float | None = None,
    ndistinct: float | None = None,
    finalize: str = "sketch",
    est_col: str = "est",
) -> DataFrame:
    """HLL aggregation with the reduction in a single JVM aggregate buffer.

    Plan shape:  scan → project xxhash64 → ObjectHashAggregate(partial)
    → shuffle ONE buffer row per (partition, key) → final merge → one tiny
    Python stage (rows == groups) for canonical serialization/estimates.
    Byte-identical output to the python and groupBy-JVM engines (tested).

    (A driver-side finalize for global queries was measured and REJECTED:
    with Python worker reuse the ArrowEvalPython stage over one blob row
    costs less than the extra first() action + createDataFrame round-trip
    it would replace — interleaved A/B 0.72s vs 0.81s on the 32M-row
    flagship — and it would make the call eager.)
    """
    from .agg import jvm_hash_expr
    from .functions import resolve_params

    b, binbits = resolve_params(b, binbits, error_rate, ndistinct)
    by = list(by or [])
    spark = df.sparkSession
    acol = hll_udaf_column(spark, jvm_hash_expr(df, value_col), b, binbits)
    gb = df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()
    agged = gb.agg(acol.alias("__blob"))
    fin = _finalize_udf(finalize)
    outname = "sketch" if finalize == "sketch" else est_col
    return agged.select(*by, fin(F.col("__blob")).alias(outname))


# ---------------------------------------------------------------------------
# sibling aggregate buffers: CountMin and Bloom (same jar, same pattern —
# flat JVM buffer per group, canonical serialization in Python)
# ---------------------------------------------------------------------------


def _sibling_udaf_column(spark: SparkSession, hash_col: Column, cls_name: str, args: list) -> Column:
    jagg = _new_jvm_obj(spark, cls_name, args)
    if jagg is None:
        raise RuntimeError(
            "hllspark-udaf.jar not loadable in this session; create the session "
            "with hllspark.jvm_udaf.configure_builder or use the groupBy builders "
            "in hllspark.sketches.jvm (byte-identical sketches)"
        )
    jvm = spark._jvm
    judf = jvm.org.apache.spark.sql.functions.udaf(jagg, jvm.org.apache.spark.sql.Encoders.LONG())
    return _to_col(judf.apply(_col_seq(spark, [hash_col])))


def _cm_blob_to_bytes(buf) -> bytes | None:
    """CountMinAggregator blob → canonical CountMin bytes (None = all-NULL)."""
    from .core.hll import HASH_XXHASH_SPARK
    from .sketches.countmin import CountMin

    buf = bytes(buf)
    if buf[0] != 1:
        raise ValueError(f"unknown countmin blob version {buf[0]}")
    width = int.from_bytes(buf[1:5], "little", signed=True)
    depth = int.from_bytes(buf[5:9], "little", signed=True)
    total = int.from_bytes(buf[9:17], "little", signed=True)
    if total == 0:
        return None
    counts = np.frombuffer(buf, dtype="<i8", count=depth * width, offset=17)
    st = CountMin(width, depth, counts.astype(np.uint64).reshape(depth, width), total, HASH_XXHASH_SPARK)
    return st.to_bytes()


def _bloom_blob_to_bytes(buf) -> bytes | None:
    """BloomAggregator blob → canonical Bloom bytes (None = all-NULL)."""
    from .core.hll import HASH_XXHASH_SPARK
    from .sketches.bloom import Bloom

    buf = bytes(buf)
    if buf[0] != 1:
        raise ValueError(f"unknown bloom blob version {buf[0]}")
    m_bits = int.from_bytes(buf[1:9], "little", signed=True)
    k = int.from_bytes(buf[9:13], "little", signed=True)
    n_added = int.from_bytes(buf[13:21], "little", signed=True)
    if n_added == 0:
        return None
    bits = np.frombuffer(buf, dtype=np.uint8, count=(m_bits + 7) // 8, offset=21).copy()
    return Bloom(m_bits, k, bits, n_added, HASH_XXHASH_SPARK).to_bytes()


def _sibling_sketch(df: DataFrame, value_col: str, by, cls_name: str, args: list, blob_fn) -> DataFrame:
    from .agg import jvm_hash_expr

    by = list(by or [])
    spark = df.sparkSession
    acol = _sibling_udaf_column(spark, jvm_hash_expr(df, value_col), cls_name, args)
    gb = df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()
    agged = gb.agg(acol.alias("__blob"))

    @pandas_udf("binary")
    def fin(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda v: None if v is None else blob_fn(v))

    return agged.select(*by, fin(F.col("__blob")).alias("sketch"))


def countmin_jvm_udaf(
    df: DataFrame, value_col: str, by: Sequence[str] | None = None, width: int = 4096, depth: int = 5
) -> DataFrame:
    """Count-Min as a single JVM aggregate buffer (long[depth×width] per
    group, elementwise-add merge) — byte-identical sketches to
    sketches.jvm.countmin_jvm and the python engine (tested).

    Trade-off vs the groupBy builder: the buffer ships depth×width×8 bytes
    per (partition, key) regardless of occupancy, where the groupBy builder
    ships only occupied (j, bucket) count rows — prefer THIS for wide inputs
    with few group keys, the groupBy builder for high-cardinality grouping
    over sparse keys."""
    from .sketches.countmin import CountMin

    CountMin.create(width=width, depth=depth)  # same validation as every sibling builder
    return _sibling_sketch(df, value_col, by, "hllsparkjvm.CountMinAggregator", [width, depth], _cm_blob_to_bytes)


def bloom_jvm_udaf(
    df: DataFrame, value_col: str, by: Sequence[str] | None = None, m_bits: int = 1 << 20, k: int = 7
) -> DataFrame:
    """Bloom filter as a single JVM aggregate buffer (bit-packed
    byte[m/8] per group, OR merge) — byte-identical to
    sketches.jvm.bloom_jvm and the python engine (tested).  Same
    ships-full-buffer trade-off as countmin_jvm_udaf."""
    from .sketches.bloom import Bloom

    Bloom.create(m_bits=m_bits, k=k)  # same validation as every sibling builder
    if m_bits > (2**31 - 1) * 8:
        # a JVM byte[] caps the buffer at 2^31-1 bytes (~17 Gbit); the
        # numpy-backed builders have no such limit
        raise ValueError("m_bits too large for the JVM buffer engine; use sketches.jvm.bloom_jvm")
    return _sibling_sketch(df, value_col, by, "hllsparkjvm.BloomAggregator", [m_bits, k], _bloom_blob_to_bytes)
