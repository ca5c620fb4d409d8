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
doing per-domain/per-user grouping should raise it — use
``hllspark.configure_session`` (131072, like bench.py).  Buffer transport
is Kryo (compact KryoSerializable encodings, see
HllRegisterAggregator.Buf.write): at 100k group keys the switch from Java
serialization measured 3.6× on the whole query.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_AGG_CLASS = "hllsparkjvm.HllRegisterAggregator"


def jar_path() -> str:
    """dist/hllspark-udaf.jar, compiled on demand when a JDK is present.

    Loads tools/build_jar.py by file location (no sys.path mutation — a
    concurrent import during the old insert/pop window could pop a foreign
    entry, per round-3 ADVICE.md)."""
    import importlib.util
    import os

    src = os.path.join(os.path.dirname(__file__), "..", "tools", "build_jar.py")
    spec = importlib.util.spec_from_file_location("hllspark_build_jar", src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return str(mod.build())


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


def _java_illegal_arg(exc, require_wrapped: bool) -> str | None:
    """If a py4j error carries a ctor-guard java.lang.IllegalArgumentException,
    return its message; else None.  Lets _new_jvm_obj tell a PARAMETER error
    (the Java ctor guards, e.g. CountMinAggregator's depth*width overflow
    check) apart from a resolution failure (jar absent / version skew).

    ``require_wrapped`` (the reflection path): Constructor.newInstance throws
    a RAW IllegalArgumentException itself for wrong arity / argument types —
    i.e. a version-skewed jar whose same-named class has a different ctor —
    while a guard thrown INSIDE the ctor arrives wrapped in
    InvocationTargetException.  Only the wrapped form is a user parameter
    error; a top-level IAE there must stay a silent fallback (None).  On the
    direct py4j path a guard IAE arrives unwrapped (arity problems surface
    as py4j-side errors with no java_exception), so top-level counts."""
    try:
        je = getattr(exc, "java_exception", None)
        wrapped = False
        for _ in range(5):
            if je is None:
                return None
            name = je.getClass().getName()
            if name == "java.lang.IllegalArgumentException" and (wrapped or not require_wrapped):
                return je.getMessage()
            wrapped = wrapped or name == "java.lang.reflect.InvocationTargetException"
            je = je.getCause()
    except Exception:
        pass
    return None


def _new_jvm_obj(spark: SparkSession, cls_name: str, args: list):
    """Instantiate any class from the udaf jar via the cached working path.

    Returns None when the jar isn't loadable in this session OR when THIS
    class is missing from the jar that did load (version skew: e.g. a
    cluster-deployed pre-round-3 jar has the HLL aggregator but not the
    CountMin/Bloom siblings) — callers surface their own helpful error or
    fall back, never a raw py4j 'JavaPackage not callable' crash.

    A constructor that DID resolve but rejected its arguments
    (IllegalArgumentException — the in-JVM parameter guards) re-raises as
    ValueError instead: a user's bad parameter must surface as the clear
    driver-side error the Java guard wrote, not be masked as 'jar not
    loadable' or silently rerouted to a fallback engine (round-4 ADVICE).

    A session where nothing resolves is NOT negatively cached: the probe
    retries on the next call, so dropping a jar in (or installing a JDK)
    mid-application starts working without a SparkContext restart."""
    key = _app_key(spark)
    if key not in _SESSION_CACHE:
        resolved = _resolve(spark)
        if resolved[0] == "none":
            return None
        # only the CURRENT application's entry can be live — drop the rest so
        # a long-lived driver cycling many sessions doesn't leak py4j loader
        # refs for stopped SparkContexts (round-3 ADVICE.md)
        _SESSION_CACHE.clear()
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
    except Exception as exc:
        msg = _java_illegal_arg(exc, require_wrapped=(mode != "direct"))
        if msg is not None:
            raise ValueError(f"{cls_name.rsplit('.', 1)[-1]}: {msg}") from None
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
    _SESSION_CACHE.clear()  # same single-live-app eviction as _new_jvm_obj
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


# (app_key, b, binbits) -> registered UserDefinedFunction.  The aggregator
# object is stateless (b/binbits final fields; buffers come from zero() per
# group), so one functions.udaf registration serves every query in the app —
# building it costs ~5 py4j round trips (~30-50 ms of driver plan-build per
# query otherwise, paid inside every timed rep).  Same single-live-app
# eviction discipline as _SESSION_CACHE: a key miss after an app restart
# clears refs into the dead JVM.
_UDAF_COL_CACHE: dict[tuple, object] = {}


def hll_udaf_column(spark: SparkSession, hash_col: Column, b: int, binbits: int) -> Column:
    """Aggregate Column: intermediate blob of HLL state over a 64-bit hash
    column (NULL hashes are ignored; an all-NULL group → empty blob)."""
    key = (_app_key(spark), "hll", b, binbits)
    judf = _UDAF_COL_CACHE.get(key)
    if judf is None:
        jagg = _new_aggregator(spark, b, binbits)
        if jagg is None:
            raise RuntimeError(
                "hllspark-udaf.jar not loadable in this session; create the session "
                "with hllspark.jvm_udaf.configure_builder or use engine='jvm' "
                "(the no-jar groupBy engine; byte-identical sketches)"
            )
        jvm = spark._jvm
        judf = jvm.org.apache.spark.sql.functions.udaf(jagg, jvm.org.apache.spark.sql.Encoders.LONG())
        if any(k[0] != key[0] for k in _UDAF_COL_CACHE):
            _UDAF_COL_CACHE.clear()  # single live app: drop dead-JVM refs
        _UDAF_COL_CACHE[key] = judf
    return _to_col(judf.apply(_col_seq(spark, [hash_col])))


def _estimate_udf_column(spark: SparkSession, blob_col: Column) -> Column | None:
    """Column: udaf intermediate blob → estimate via the in-JVM estimator
    (HllBlobEstimateUdf), or None when the class is absent (a pre-round-5
    jar — version skew).  With it the distinct-count query path is
    scan → xxhash64 → ObjectHashAggregate → one JVM scalar call per group:
    no Arrow transfer, no Python worker.  Estimates match the pandas
    finalize (_blob_estimate) bit-for-bit except in the linear-counting
    regimes, where the JVM's StrictMath.log (fdlibm — chosen for
    bit-reproducibility across JIT tiers/platforms) can differ from the
    platform libm CPython uses by at most 1 ulp (~1e-16 relative; the
    10-decimal goldens and the micro-unit contract compare are unaffected;
    tests/test_jvm_estimate.py pins both regimes across modes, precisions
    and chain rows).

    Callers fall back silently to the pandas finalize: the aggregation
    engine itself resolved (hll_udaf_column raised otherwise), only the
    finalize optimization is missing, and results are identical either way
    (the version-skew pattern: guard the calls, not the imports)."""
    key = (_app_key(spark), "blob_estimate")
    ju = _UDAF_COL_CACHE.get(key)
    if ju is None:
        factory = _new_jvm_obj(spark, "hllsparkjvm.HllUdfs", [])
        if factory is None:
            return None
        try:
            # overload selection happens in Java (HllUdfs.blobEstimate): py4j
            # calling functions.udf(obj, dt) directly can bind the deprecated
            # untyped-Scala overload, which Spark 4 rejects (UNTYPED_SCALA_UDF)
            ju = factory.blobEstimate()
        except Exception:
            return None
        if any(k[0] != key[0] for k in _UDAF_COL_CACHE):
            _UDAF_COL_CACHE.clear()
        _UDAF_COL_CACHE[key] = ju
    try:
        return _to_col(ju.apply(_col_seq(spark, [blob_col])))
    except Exception:
        return None


def hll_estimate_col(spark: SparkSession, sketch_col: Column | str) -> Column:
    """Per-row estimate of STORED canonical counters in the JVM
    (HllSketchEstimateUdf) — the ``hyperloglog_get_estimate`` / ``#`` read
    path over sketch rollup tables (reference postgres.sql:112-114) with no
    pandas decode per row: decodes every v1/v2 canonical payload form
    (raw/group-varint sparse, raw/bit-packed/deflated dense, via the same
    Java decoder the blob-merge aggregator uses) and estimates with the
    in-JVM estimator (parity contract in _estimate_udf_column).

    EXPLICIT-engine semantics: raises RuntimeError when the jar (or this
    class — version skew) isn't loadable, like the other jvm_udaf entry
    points.  Scope contract — identical to the pandas reader's: CANONICAL
    hllspark counters only; the Postgres reference's own legacy wire blobs
    (PGLZ dense, core/legacy.py) fail loudly in BOTH paths and must go
    through ``hll_update`` first, exactly as in the reference
    (test/sql/update.sql workflow).  ``functions.hll_estimate`` remains the
    jar-free default; this is the faster all-JVM read for sketch rollup
    tables."""
    return _read_udf_apply(
        spark, "sketchEstimate", "HllSketchEstimateUdf", "functions.hll_estimate",
        [_as_col(sketch_col)],
    )


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _read_udf_apply(spark: SparkSession, method: str, klass: str, fallback: str, cols) -> Column:
    """Bind one of HllUdfs' scalar read-UDF factories and apply it.

    EXPLICIT-engine semantics shared by every per-row read entry point:
    RuntimeError when the jar (or the factory method — version skew on a
    pre-round-5 jar) isn't loadable, naming the pandas fallback."""
    factory = _new_jvm_obj(spark, "hllsparkjvm.HllUdfs", [])
    ju = None
    if factory is not None:
        try:
            ju = getattr(factory, method)()
        except Exception:
            ju = None
    if ju is None:
        raise RuntimeError(
            f"hllspark-udaf.jar with {klass} not loadable in this session; "
            "create the session with hllspark.jvm_udaf.configure_builder "
            f"(round-5+ jar) or use hllspark.{fallback} (pandas)"
        )
    return _to_col(ju.apply(_col_seq(spark, cols)))


def cm_query_col(spark: SparkSession, df, sketch_col: Column | str, value_col: str) -> Column:
    """Per-row count-min frequency estimate of STORED sketches, entirely in
    the JVM — the probe value (a column NAME in ``df``, so its SQL type
    drives the same integral canonicalization as build time) is hashed with
    ``agg.jvm_hash_expr`` and looked up by the Java UDF
    (SketchReadUdfs.CountMinQuery; bit parity with functions.cm_query).

    Hash-domain contract: serves hash_kind=1 (xxhash64 / JVM-built)
    sketches ONLY — murmur-built sketches are refused loudly in the task,
    because an xxhash64 probe would silently miss their cells.
    ``functions.cm_query`` remains the universal reader (it re-hashes the
    probe in whatever domain the sketch header declares)."""
    from . import agg as _agg

    return _read_udf_apply(
        spark, "cmQuery", "SketchReadUdfs.CountMinQuery", "functions.cm_query",
        [_as_col(sketch_col), _agg.jvm_hash_expr(df, value_col)],
    )


def bloom_contains_col(spark: SparkSession, df, sketch_col: Column | str, value_col: str) -> Column:
    """Per-row bloom membership probe of STORED sketches in the JVM
    (SketchReadUdfs.BloomContains) — same probe-hash and hash-domain
    contract as cm_query_col; bit parity with functions.bloom_contains."""
    from . import agg as _agg

    return _read_udf_apply(
        spark, "bloomContains", "SketchReadUdfs.BloomContains", "functions.bloom_contains",
        [_as_col(sketch_col), _agg.jvm_hash_expr(df, value_col)],
    )


def tdigest_quantile_col(spark: SparkSession, sketch_col: Column | str, q: Column | float) -> Column:
    """Per-row t-digest quantile over STORED canonical digests in the JVM
    (SketchReadUdfs.TDigestQuantile) — replicates functions.tdigest_quantile
    bit-exactly (sequential cumsum + searchsorted-left + the same
    interpolation operation order; no transcendental calls)."""
    qc = q if isinstance(q, Column) else F.lit(float(q))
    return _read_udf_apply(
        spark, "tdigestQuantile", "SketchReadUdfs.TDigestQuantile", "functions.tdigest_quantile",
        [_as_col(sketch_col), qc.cast("double")],
    )


def tdigest_rank_col(spark: SparkSession, sketch_col: Column | str, x: Column | float) -> Column:
    """Per-row approximate CDF over STORED canonical digests in the JVM
    (SketchReadUdfs.TDigestRank) — replicates functions.tdigest_rank's
    np.interp formula bit-exactly."""
    xc = x if isinstance(x, Column) else F.lit(float(x))
    return _read_udf_apply(
        spark, "tdigestRank", "SketchReadUdfs.TDigestRank", "functions.tdigest_rank",
        [_as_col(sketch_col), xc.cast("double")],
    )


def kll_quantile_col(spark: SparkSession, sketch_col: Column | str, q: Column | float) -> Column:
    """Per-row KLL quantile over STORED canonical sketches in the JVM
    (SketchReadUdfs.KllQuantile) — replicates functions.kll_quantile
    (stable weighted sort + searchsorted-left item selection) bit-exactly."""
    qc = q if isinstance(q, Column) else F.lit(float(q))
    return _read_udf_apply(
        spark, "kllQuantile", "SketchReadUdfs.KllQuantile", "functions.kll_quantile",
        [_as_col(sketch_col), qc.cast("double")],
    )


def minhash_jaccard_col(spark: SparkSession, a: Column | str, b: Column | str) -> Column:
    """Per-row jaccard between two STORED minhash signature columns in the
    JVM (SketchReadUdfs.MinHashJaccard) — bit parity with
    functions.minhash_jaccard, including the k / hash-kind refusals."""
    return _read_udf_apply(
        spark, "minhashJaccard", "SketchReadUdfs.MinHashJaccard", "functions.minhash_jaccard",
        [_as_col(a), _as_col(b)],
    )


def hll_union_estimate_col(spark: SparkSession, a: Column | str, b: Column | str) -> Column:
    """Per-row union estimate est(A∪B) of two STORED counter columns in the
    JVM (HllSetOpUdfs.UnionEstimate) — the ``hyperloglog_union`` read path
    (reference postgres.sql:131-136) over sketch rollup tables without a
    pandas decode per row.  Decode/merge reuse HllMergeAggregator.mergeBlob,
    so every canonical v1/v2 payload form is accepted and parameter- or
    hash-kind-mismatched operands refuse loudly, exactly like the merge
    aggregator.  Estimate parity contract as hll_estimate_col (StrictMath
    ≤1 ulp in the linear-counting regimes only).  NULL contract matches
    functions.hll_union_estimate: one NULL operand → estimate of the other,
    both NULL → NULL."""
    return _read_udf_apply(
        spark, "unionEstimate", "HllSetOpUdfs.UnionEstimate", "functions.hll_union_estimate",
        [_as_col(a), _as_col(b)],
    )


def hll_intersection_col(spark: SparkSession, a: Column | str, b: Column | str) -> Column:
    """Per-row inclusion–exclusion intersection estimate
    est(A) + est(B) − est(A∪B) in the JVM (HllSetOpUdfs.IntersectionEstimate;
    reference hyperloglog_counter.c:1089-1113) — same decode/parity/refusal
    contract as hll_union_estimate_col; the double arithmetic replays
    core.hll.intersection_estimate's operation order exactly.  NULL contract
    matches functions.hll_intersection: one NULL operand → 0.0 (empty set),
    both NULL → NULL."""
    return _read_udf_apply(
        spark, "intersectionEstimate", "HllSetOpUdfs.IntersectionEstimate",
        "functions.hll_intersection", [_as_col(a), _as_col(b)],
    )


def hll_compliment_col(spark: SparkSession, a: Column | str, b: Column | str) -> Column:
    """Per-row difference estimate est(A∪B) − est(B) in the JVM
    (HllSetOpUdfs.ComplimentEstimate; reference spelling,
    hyperloglog_counter.c:1115-1152) — contract as hll_intersection_col."""
    return _read_udf_apply(
        spark, "complimentEstimate", "HllSetOpUdfs.ComplimentEstimate",
        "functions.hll_compliment", [_as_col(a), _as_col(b)],
    )


def hll_symmetric_diff_col(spark: SparkSession, a: Column | str, b: Column | str) -> Column:
    """Per-row symmetric-difference estimate 2·est(A∪B) − est(A) − est(B) in
    the JVM (HllSetOpUdfs.SymmetricDiffEstimate; reference
    hyperloglog_counter.c:1154-1193) — contract as hll_intersection_col."""
    return _read_udf_apply(
        spark, "symmetricDiffEstimate", "HllSetOpUdfs.SymmetricDiffEstimate",
        "functions.hll_symmetric_diff", [_as_col(a), _as_col(b)],
    )


def register_sql_jvm(spark: SparkSession) -> None:
    """Register the sketch-argument read UDFs for spark.sql(...) as
    ``*_jvm`` names next to functions.register_sql's pandas surface:
    hll_estimate_jvm, tdigest_quantile_jvm, tdigest_rank_jvm,
    kll_quantile_jvm, minhash_jaccard_jvm, and the pairwise set-operation
    estimates hll_union_estimate_jvm / hll_intersection_jvm /
    hll_compliment_jvm / hll_symmetric_diff_jvm.

    The PROBING readers (count-min point query, bloom membership) are
    deliberately NOT SQL-registered: their probe argument must be hashed
    with jvm_hash_expr's TYPE-dependent canonicalization, which a raw SQL
    call site can't see — use cm_query_col / bloom_contains_col from
    Python, or the SQL-registered pandas cm_query / bloom_contains, which
    re-hash the probe safely from the sketch header.

    EXPLICIT-engine semantics: RuntimeError when the jar isn't resolvable
    by the driver's class loader (spark.jars / --jars; the runtime ADD JAR
    fallback can't serve registerJavaFunction)."""
    from pyspark.sql.types import DoubleType

    names = {
        "hll_estimate_jvm": "hllsparkjvm.HllSketchEstimateUdf",
        "tdigest_quantile_jvm": "hllsparkjvm.SketchReadUdfs$TDigestQuantile",
        "tdigest_rank_jvm": "hllsparkjvm.SketchReadUdfs$TDigestRank",
        "kll_quantile_jvm": "hllsparkjvm.SketchReadUdfs$KllQuantile",
        "minhash_jaccard_jvm": "hllsparkjvm.SketchReadUdfs$MinHashJaccard",
        "hll_union_estimate_jvm": "hllsparkjvm.HllSetOpUdfs$UnionEstimate",
        "hll_intersection_jvm": "hllsparkjvm.HllSetOpUdfs$IntersectionEstimate",
        "hll_compliment_jvm": "hllsparkjvm.HllSetOpUdfs$ComplimentEstimate",
        "hll_symmetric_diff_jvm": "hllsparkjvm.HllSetOpUdfs$SymmetricDiffEstimate",
    }
    try:
        for name, cls in names.items():
            spark.udf.registerJavaFunction(name, cls, DoubleType())
    except Exception:
        raise RuntimeError(
            "hllspark-udaf.jar classes not resolvable for SQL registration; "
            "put the jar on spark.jars/--jars (hllspark.configure_session does) "
            "or use functions.register_sql's pandas surface"
        ) from None


def _blob_to_hll(buf):
    """Rebuild the exact core.hll.HLL state from the aggregator's blob
    (v1: HllRegisterAggregator.finish — pre-hashed build path, hash_kind is
    always xxhash; v2: HllMergeAggregator.finish — stored-sketch merge path,
    hash_kind carried in the blob).  Returns None for the empty blob
    (all-NULL or zero-row group → SQL NULL, reference contract)."""
    from .core.hll import HASH_XXHASH_SPARK, HLL, sparse_capacity

    buf = bytes(buf)
    version, mode, b, binbits = buf[0], buf[1], buf[2], buf[3]
    if version == 1:
        hash_kind = HASH_XXHASH_SPARK
        off = 4
    elif version == 2:
        hash_kind = buf[4]
        off = 5
        if b == 0:
            return None  # uninitialized merge buffer: every input was NULL
    else:
        raise ValueError(f"unknown udaf blob version {version}")
    nchain = int.from_bytes(buf[off : off + 4], "little", signed=True)
    off += 4
    chains = np.frombuffer(buf, dtype="<i8", count=nchain, offset=off)
    off += 8 * nchain
    if mode == 0:
        n = int.from_bytes(buf[off : off + 4], "little", signed=True)
        off += 4
        # the aggregator's open-addressing table guarantees UNIQUE encodings;
        # only sortedness is needed for the canonical sparse state — np.sort
        # halves the per-blob finalize cost vs np.unique (measured 10.9 →
        # ~6 µs/blob, which is 25% of a 100k-group query)
        encs = np.sort(np.frombuffer(buf, dtype="<u4", count=n, offset=off))
        if n == 0 and nchain == 0 and version == 1:
            # v1 build path: zero ingested values → all-NULL group → SQL NULL.
            # v2 (stored-blob merge) marks all-NULL with b == 0 (checked
            # above); n == 0 there is a LEGITIMATE empty stored counter and
            # must round-trip as one — the python merge path keeps it, and
            # byte parity with merge_partials requires we do too
            return None
        if len(encs) > sparse_capacity(b):
            # can't arise from the aggregator (it promotes at >cap) but keep
            # the invariant locally enforced
            sk = HLL(b, binbits, encs, None, hash_kind)
            sk._promote()
        else:
            sk = HLL(b, binbits, encs, None, hash_kind)
    else:
        regs = np.frombuffer(buf, dtype=np.uint8, count=1 << b, offset=off).copy()
        sk = HLL(b, binbits, None, regs, hash_kind)
    if nchain:
        sk.add_hashes(chains.view(np.uint64))
    return sk


def _blob_estimate(buf):
    """Fast estimate straight from the aggregator blob: the common sparse
    no-chain case needs only the unique-encode COUNT (linear counting,
    core.hll._estimate_sparse) — no array sort, no HLL construction.  Every
    other shape falls back to the exact full path.  Bit-identical results:
    the same formula on the same count."""
    from .core.hll import _estimate_sparse

    b_ = bytes(buf)
    version, mode = b_[0], b_[1]
    if mode == 0 and version in (1, 2):
        binbits = b_[3]
        off = 4 if version == 1 else 5
        if version == 2 and b_[2] == 0:
            return None  # uninitialized merge buffer
        nchain = int.from_bytes(b_[off : off + 4], "little", signed=True)
        if nchain == 0:
            n = int.from_bytes(b_[off + 4 : off + 8], "little", signed=True)
            if n == 0:
                # v1: all-NULL → NULL; v2: a valid EMPTY stored counter
                return None if version == 1 else _estimate_sparse(0, binbits)
            return _estimate_sparse(n, binbits)
    sk = _blob_to_hll(b_)
    return None if sk is None else sk.estimate()


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
            return blobs.map(lambda v: None if v is None else _blob_estimate(v))

        return fin
    if finalize == "estimate_bigint":

        @pandas_udf("long")
        def fin(blobs: pd.Series) -> pd.Series:
            def est(v):
                e = None if v is None else _blob_estimate(v)
                return 0 if e is None else int(round(e))

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
    outname = "sketch" if finalize == "sketch" else est_col
    if finalize in ("estimate", "estimate_bigint"):
        jcol = _estimate_udf_column(spark, F.col("__blob"))
        if jcol is not None:
            if finalize == "estimate_bigint":
                # int(round(e)) is half-even → bround; NULL coalesces to 0
                jcol = F.coalesce(F.bround(jcol).cast("long"), F.lit(0))
            return agged.select(*by, jcol.alias(outname))
    fin = _finalize_udf(finalize)
    return agged.select(*by, fin(F.col("__blob")).alias(outname))


def sketch_cube_jvm_udaf(
    df: DataFrame,
    value_col: str,
    dims: Sequence[str],
    sets: Sequence[Sequence[str]],
    b: int | None = None,
    binbits: int | None = None,
    error_rate: float | None = None,
    ndistinct: float | None = None,
    finalize: str = "sketch",
    est_col: str = "est",
    gid_col: str = "grouping_id",
) -> DataFrame:
    """Multi-granularity HLL rollup (GROUPING SETS / CUBE / ROLLUP) in ONE
    scan: Catalyst Expand replicates each input row once per grouping set
    BEFORE the partial aggregate, so map-side combine still collapses every
    (set, key) to one JVM buffer per task — the shuffle carries
    |sets| × |keys| buffer rows, not |sets| × |input rows|.

    The reference gets this for free from SQL composition (counters under
    any ``GROUP BY GROUPING SETS``, postgres.sql aggregate forms); here it
    is the DataFrame-level equivalent over the typed aggregator.  Output:
    dims (NULL where aggregated away) + ``gid_col`` (Spark grouping_id
    bit-per-dim, MSB = first dim, 1 = aggregated away — disambiguates a
    rolled-up NULL from an actual NULL key value) + sketch/estimate.

    Each cell's sketch is byte-identical to a separate
    ``agg.sketch(df, col, by=set)`` at that granularity (merge determinism:
    canonical state is a pure function of the value SET), so rollup tables
    built this way can be re-aggregated or read by every stored-blob path.
    ``finalize`` as in sketch_jvm_udaf (estimates stay fully in-JVM when
    the round-5 jar is loaded)."""
    from .agg import jvm_hash_expr
    from .functions import resolve_params

    b, binbits = resolve_params(b, binbits, error_rate, ndistinct)
    dims = list(dims)
    spark = df.sparkSession
    acol = hll_udaf_column(spark, jvm_hash_expr(df, value_col), b, binbits)
    gd = df.groupingSets([list(s) for s in sets], *dims)
    agged = gd.agg(acol.alias("__blob"), F.grouping_id().cast("long").alias(gid_col))
    outname = "sketch" if finalize == "sketch" else est_col
    if finalize in ("estimate", "estimate_bigint"):
        jcol = _estimate_udf_column(spark, F.col("__blob"))
        if jcol is not None:
            if finalize == "estimate_bigint":
                jcol = F.coalesce(F.bround(jcol).cast("long"), F.lit(0))
            return agged.select(*dims, gid_col, jcol.alias(outname))
    fin = _finalize_udf(finalize)
    return agged.select(*dims, gid_col, fin(F.col("__blob")).alias(outname))


# ---------------------------------------------------------------------------
# sibling aggregate buffers: CountMin and Bloom (same jar, same pattern —
# flat JVM buffer per group, canonical serialization in Python)
# ---------------------------------------------------------------------------


def _sibling_udaf_column(
    spark: SparkSession, in_col: Column, cls_name: str, args: list, encoder: str = "long"
) -> Column:
    jagg = _new_jvm_obj(spark, cls_name, args)
    if jagg is None:
        raise RuntimeError(
            "hllspark-udaf.jar not loadable in this session; create the session "
            "with hllspark.jvm_udaf.configure_builder or use the groupBy builders "
            "in hllspark.sketches.jvm (byte-identical sketches)"
        )
    jvm = spark._jvm
    E = jvm.org.apache.spark.sql.Encoders
    jenc = {"long": E.LONG, "double": E.DOUBLE, "binary": E.BINARY}[encoder]()
    judf = jvm.org.apache.spark.sql.functions.udaf(jagg, jenc)
    return _to_col(judf.apply(_col_seq(spark, [in_col])))


def _cm_blob_to_bytes(buf) -> bytes | None:
    """CountMinAggregator blob → canonical CountMin bytes (None = all-NULL).

    v1 (build path): hash_kind is always xxhash, total == 0 means all-NULL.
    v2 (stored-blob merge): hash_kind carried after the version byte;
    width == 0 is the ONLY all-NULL marker — total == 0 with width > 0 is
    a legitimate EMPTY stored sketch (the HLL v2 lesson)."""
    from .core.hll import HASH_XXHASH_SPARK
    from .sketches.countmin import CountMin

    buf = bytes(buf)
    version = buf[0]
    if version == 1:
        hash_kind, off = HASH_XXHASH_SPARK, 1
    elif version == 2:
        hash_kind, off = buf[1], 2
    else:
        raise ValueError(f"unknown countmin blob version {version}")
    width = int.from_bytes(buf[off : off + 4], "little", signed=True)
    depth = int.from_bytes(buf[off + 4 : off + 8], "little", signed=True)
    total = int.from_bytes(buf[off + 8 : off + 16], "little", signed=True)
    if (version == 1 and total == 0) or (version == 2 and width == 0):
        return None
    counts = np.frombuffer(buf, dtype="<i8", count=depth * width, offset=off + 16)
    st = CountMin(width, depth, counts.astype(np.uint64).reshape(depth, width), total, hash_kind)
    return st.to_bytes()


def _bloom_blob_to_bytes(buf) -> bytes | None:
    """BloomAggregator blob → canonical Bloom bytes (None = all-NULL).
    v1: n_added == 0 means all-NULL; v2 (stored merge, hash_kind after the
    version byte): m_bits == 0 is the only all-NULL marker."""
    from .core.hll import HASH_XXHASH_SPARK
    from .sketches.bloom import Bloom

    buf = bytes(buf)
    version = buf[0]
    if version == 1:
        hash_kind, off = HASH_XXHASH_SPARK, 1
    elif version == 2:
        hash_kind, off = buf[1], 2
    else:
        raise ValueError(f"unknown bloom blob version {version}")
    m_bits = int.from_bytes(buf[off : off + 8], "little", signed=True)
    k = int.from_bytes(buf[off + 8 : off + 12], "little", signed=True)
    n_added = int.from_bytes(buf[off + 12 : off + 20], "little", signed=True)
    if (version == 1 and n_added == 0) or (version == 2 and m_bits == 0):
        return None
    bits = np.frombuffer(buf, dtype=np.uint8, count=(m_bits + 7) // 8, offset=off + 20).copy()
    return Bloom(m_bits, k, bits, n_added, hash_kind).to_bytes()


class GroupingSets(NamedTuple):
    """Multi-granularity grouping spec accepted wherever the sibling udaf
    builders take ``by`` (router.build_cube constructs it): aggregate under
    ``df.groupingSets(sets, *dims)`` instead of a plain groupBy, emitting
    dims (NULL where aggregated away) + ``gid_col`` (Spark grouping_id,
    MSB = dims[0]) alongside the sketch.  Same single-scan Expand plan as
    agg.sketch_cube's udaf path."""

    dims: Sequence[str]
    sets: Sequence[Sequence[str]]
    gid_col: str = "grouping_id"


def _sibling_sketch(
    df: DataFrame,
    value_col: str,
    by,
    cls_name: str,
    args: list,
    blob_fn,
    in_col: Column | None = None,
    encoder: str = "long",
) -> DataFrame:
    from .agg import jvm_hash_expr

    spark = df.sparkSession
    if in_col is None:
        in_col = jvm_hash_expr(df, value_col)
    acol = _sibling_udaf_column(spark, in_col, cls_name, args, encoder=encoder)
    if isinstance(by, GroupingSets):
        gd = df.groupingSets([list(s) for s in by.sets], *by.dims)
        agged = gd.agg(acol.alias("__blob"), F.grouping_id().cast("long").alias(by.gid_col))
        keep = [*by.dims, by.gid_col]
    else:
        by = list(by or [])
        gb = df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()
        agged = gb.agg(acol.alias("__blob"))
        keep = by

    @pandas_udf("binary")
    def fin(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda v: None if v is None else blob_fn(v))

    return agged.select(*keep, fin(F.col("__blob")).alias("sketch"))


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


# ---------------------------------------------------------------------------
# round 4: MinHash + quantile (t-digest / KLL) aggregate buffers
# ---------------------------------------------------------------------------


def _mh_blob_to_bytes(buf) -> bytes | None:
    """MinHashAggregator blob → canonical MinHash v2 bytes (None = all-NULL)."""
    from .core.hll import HASH_XXHASH_SPARK
    from .sketches.minhash import MinHash

    buf = bytes(buf)
    version = buf[0]
    if version == 1:
        hash_kind, off = HASH_XXHASH_SPARK, 1
    elif version == 2:  # stored-blob merge: hash_kind after the version byte
        hash_kind, off = buf[1], 2
    else:
        raise ValueError(f"unknown minhash blob version {version}")
    k = int.from_bytes(buf[off : off + 4], "little", signed=True)
    n = int.from_bytes(buf[off + 4 : off + 12], "little", signed=True)
    if (version == 1 and n == 0) or (version == 2 and k == 0):
        # v1 build path: no values → all-NULL; v2: k == 0 is the marker
        # (n == 0 with k > 0 is a legitimate empty stored signature)
        return None
    sig = np.frombuffer(buf, dtype="<i8", count=k, offset=off + 12).view(np.uint64).copy()
    return MinHash(k, sig, n, hash_kind).to_bytes()


def minhash_jvm_udaf(df: DataFrame, value_col: str, by: Sequence[str] | None = None, k: int = 128) -> DataFrame:
    """MinHash signature as a single JVM aggregate buffer (long[k] unsigned
    mins, elementwise-min merge — associative/commutative/idempotent, so the
    signature is a pure function of the value set like HLL's register max).
    Byte-identical sketches to sketches.jvm.minhash_jvm and the python
    engine with hash_kind=HASH_XXHASH_SPARK (tested): the aggregator replays
    Spark's own xxhash64(hash, lit(j)) slot chain in-JVM.

    Vs the groupBy builder (k min() aggregate columns): one flat buffer per
    group instead of a k-column aggregate row — the same plan-shape win as
    the HLL udaf engine, and the per-row cost is k hashInt calls either way."""
    from .sketches.minhash import MinHash

    MinHash.create(k=k)  # same validation as every sibling builder
    return _sibling_sketch(df, value_col, by, "hllsparkjvm.MinHashAggregator", [k], _mh_blob_to_bytes)


def _quantile_in_expr(df: DataFrame, value_col: str) -> Column:
    """cast-to-double with NaN→NULL, mirroring sketches/jvm.py _value_counts
    (no quantile sketch ingests NaN; NULLs are skipped by the aggregator)."""
    v = F.col(value_col).cast("double")
    return F.when(F.isnan(v), F.lit(None)).otherwise(v)


def _td_blob_to_bytes(buf) -> bytes | None:
    """TDigestAggregator blob → canonical TDigest bytes (None = all-NULL).

    mode 0 (exact value→count map): replay the IDENTICAL sorted weighted
    fold as sketches/jvm.py tdigest_jvm → byte parity with the groupBy
    builder.  mode 1 (bounded in-JVM centroids): the state is already a
    valid k1-scale digest — wrap and serialize."""
    from .sketches.tdigest import TDigest

    buf = bytes(buf)
    if buf[0] != 1:
        raise ValueError(f"unknown tdigest blob version {buf[0]}")
    mode = buf[1]
    delta = int.from_bytes(buf[2:4], "little")
    if mode == 0:
        n = int.from_bytes(buf[4:8], "little", signed=True)
        if n == 0:
            return None
        vals = np.frombuffer(buf, dtype="<f8", count=n, offset=8)
        counts = np.frombuffer(buf, dtype="<i8", count=n, offset=8 + 8 * n)
        order = np.argsort(vals, kind="stable")
        st = TDigest.create(delta=delta)
        st.update_weighted(vals[order], counts[order].astype(np.float64))
        return st.to_bytes()
    ncent = int.from_bytes(buf[4:8], "little", signed=True)
    total, vmin, vmax = np.frombuffer(buf, dtype="<f8", count=3, offset=8)
    # mode-1 with zero centroids only arises from the stored-blob merge of
    # EMPTY digests (the build aggregator's digest mode always holds data):
    # a legitimate empty sketch, not SQL NULL
    means = np.frombuffer(buf, dtype="<f8", count=ncent, offset=32).astype(np.float64)
    weights = np.frombuffer(buf, dtype="<f8", count=ncent, offset=32 + 8 * ncent).astype(np.float64)
    return TDigest(delta, means, weights, float(total), float(vmin), float(vmax)).to_bytes()


def _kll_blob_to_bytes(buf) -> bytes | None:
    """KllAggregator blob → canonical KLL bytes (None = all-NULL).  mode 0
    replays the sorted binary-weight-decomposition insert of
    sketches/jvm.py kll_jvm (byte parity); mode 1 wraps the in-JVM
    compactor levels directly."""
    from .sketches.kll import KLL

    buf = bytes(buf)
    if buf[0] != 1:
        raise ValueError(f"unknown kll blob version {buf[0]}")
    mode = buf[1]
    k = int.from_bytes(buf[2:4], "little")
    if mode == 0:
        n = int.from_bytes(buf[4:8], "little", signed=True)
        if n == 0:
            return None
        vals = np.frombuffer(buf, dtype="<f8", count=n, offset=8)
        counts = np.frombuffer(buf, dtype="<i8", count=n, offset=8 + 8 * n)
        order = np.argsort(vals, kind="stable")
        st = KLL.create(k=k)
        st.update_weighted(vals[order], counts[order])
        return st.to_bytes()
    nlevels = int.from_bytes(buf[4:8], "little", signed=True)
    total = int.from_bytes(buf[8:16], "little", signed=True)
    compactions = int.from_bytes(buf[16:24], "little", signed=True)
    vmin, vmax = np.frombuffer(buf, dtype="<f8", count=2, offset=24)
    # mode-1 with total == 0 only arises from the stored-blob merge of
    # EMPTY sketches — a legitimate empty KLL, not SQL NULL
    sizes = np.frombuffer(buf, dtype="<i4", count=nlevels, offset=40)
    off = 40 + 4 * nlevels
    levels = []
    for sz in sizes:
        levels.append(np.frombuffer(buf, dtype="<f8", count=int(sz), offset=off).astype(np.float64))
        off += 8 * int(sz)
    if not levels:
        levels = [np.empty(0, np.float64)]
    return KLL(k, levels, total, compactions, float(vmin), float(vmax)).to_bytes()


def tdigest_jvm_udaf(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    delta: int = 100,
    exact_capacity: int = 8192,
) -> DataFrame:
    """t-digest as a JVM aggregate buffer with a TWO-MODE buffer (the
    quantile analogue of HLL's sparse→dense): an exact value→count map
    while a buffer holds ≤ exact_capacity distinct values, folded into
    bounded k1-scale centroids past it (TDigestAggregator.java).

    This is the scale path for CONTINUOUS columns, where the groupBy
    builder (sketches.jvm.tdigest_jvm) degrades to shuffling one row per
    distinct value (≈ the row count): here each buffer ships at most
    min(distinct, exact_capacity) map entries or ~δ/2 centroids.

    Determinism contract: while every buffer stays exact the sketch is
    byte-identical to tdigest_jvm / the python engine (a pure function of
    the value multiset — tested).  Past exact_capacity the centroid layout
    depends on partition/merge order within the k1-scale rank-error bound
    (like every practical t-digest, incl. the python engine's
    partition-batching dependence), so bytes are not run-reproducible —
    set exact_capacity above the expected distinct count if you need the
    exact-mode contract.

    Memory: a buffer at the promotion point transiently holds
    ~32 B × exact_capacity (the map arrays); with very many simultaneous
    in-memory groups per task (high fallback threshold × high key
    cardinality) lower exact_capacity — the digest itself is only O(δ)."""
    from .sketches.tdigest import TDigest

    TDigest.create(delta=delta)  # same validation as every sibling builder
    if exact_capacity < 16:  # mirror the TDigestAggregator.java ctor guard
        raise ValueError("exact_capacity must be >= 16")
    return _sibling_sketch(
        df, value_col, by,
        "hllsparkjvm.TDigestAggregator", [delta, exact_capacity],
        _td_blob_to_bytes,
        in_col=_quantile_in_expr(df, value_col),
        encoder="double",
    )


def kll_jvm_udaf(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    k: int = 200,
    exact_capacity: int = 8192,
) -> DataFrame:
    """KLL as a JVM aggregate buffer — same two-mode design as
    tdigest_jvm_udaf (exact map ≤ exact_capacity distinct values → real
    KLL compactor levels past it, KllAggregator.java).  Exact mode is
    byte-identical to sketches.jvm.kll_jvm (tested); compactor mode is
    bounded at O(k) items per buffer with the ~1.33/k rank-error bound and
    the same order-dependence caveat as tdigest_jvm_udaf."""
    from .sketches.kll import KLL

    KLL.create(k=k)  # same validation as every sibling builder
    if exact_capacity < 16:  # mirror the KllAggregator.java ctor guard
        raise ValueError("exact_capacity must be >= 16")
    return _sibling_sketch(
        df, value_col, by,
        "hllsparkjvm.KllAggregator", [k, exact_capacity],
        _kll_blob_to_bytes,
        in_col=_quantile_in_expr(df, value_col),
        encoder="double",
    )


# ---------------------------------------------------------------------------
# round 4: merge of STORED canonical sketch blobs as a JVM aggregate buffer
# ---------------------------------------------------------------------------


def hll_merge_udaf(
    df: DataFrame,
    sketch_col: str = "sketch",
    by: Sequence[str] | None = None,
    finalize: str = "sketch",
    est_col: str = "est",
) -> DataFrame:
    """The reference's ``sum(hyperloglog_estimator)`` / ``hyperloglog_merge``
    re-aggregation (README.md:135-166) with the whole reduction in a JVM
    aggregate buffer: every input row is a serialized counter (any v1/v2
    payload encoding — raw/group-varint sparse, raw/bit-packed/deflated
    dense), decoded and register-merged in place (HllMergeAggregator.java).
    Byte-identical results to agg.merge_partials (tested); the aggregator is
    parameterless — (b, binbits, hash_kind) are adopted from the first
    counter and mismatches refuse to merge, like the reference
    (hyperloglog.c:858-874) and the hash_kind contract.

    This is the scale path for stored-sketch rollup tables (per-domain /
    per-day counters re-aggregated with NO raw-data pass): one bounded
    buffer per output group, no per-key Python until the final canonical
    serialization.  NULL counters are skipped; a group of only NULLs yields
    a SQL NULL sketch (strict-aggregate contract)."""
    by = list(by or [])
    spark = df.sparkSession
    try:
        acol = _sibling_udaf_column(
            spark, F.col(sketch_col), "hllsparkjvm.HllMergeAggregator", [], encoder="binary"
        )
    except RuntimeError:
        raise RuntimeError(
            "hllspark-udaf.jar (with HllMergeAggregator) not loadable in this "
            "session; create the session with hllspark.jvm_udaf.configure_builder "
            "or use agg.merge_partials(engine='python') (byte-identical results)"
        ) from None
    gb = df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()
    agged = gb.agg(acol.alias("__blob"))
    outname = "sketch" if finalize == "sketch" else est_col
    if finalize in ("estimate", "estimate_bigint"):
        jcol = _estimate_udf_column(spark, F.col("__blob"))
        if jcol is not None:  # silent pandas fallback on a pre-round-5 jar
            if finalize == "estimate_bigint":
                jcol = F.coalesce(F.bround(jcol).cast("long"), F.lit(0))
            return agged.select(*by, jcol.alias(outname))
    fin = _finalize_udf(finalize)
    return agged.select(*by, fin(F.col("__blob")).alias(outname))


_MERGE_CLASSES = {
    "countmin": ("hllsparkjvm.CountMinBlobMergeAggregator", _cm_blob_to_bytes),
    "bloom": ("hllsparkjvm.BloomBlobMergeAggregator", _bloom_blob_to_bytes),
    "minhash": ("hllsparkjvm.MinHashBlobMergeAggregator", _mh_blob_to_bytes),
    "tdigest": ("hllsparkjvm.TDigestBlobMergeAggregator", _td_blob_to_bytes),
    "kll": ("hllsparkjvm.KllBlobMergeAggregator", _kll_blob_to_bytes),
}


def sibling_merge_udaf(
    df: DataFrame,
    kind: str,
    sketch_col: str = "sketch",
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Merge of STORED canonical sibling-sketch blobs as a JVM aggregate
    buffer — hll_merge_udaf's counterpart for count-min / Bloom / MinHash /
    t-digest / KLL rollup tables (jvm/src *BlobMergeAggregator classes).

    Each aggregator is parameterless (params + hash_kind adopt from the
    first counter; mismatches refuse to merge, replicating the python
    ``merge`` guards).  count-min (+), Bloom (|) and MinHash (unsigned min)
    merges are exact → byte-identical to ``agg.merge_partials(cls=...)``
    (tested); the quantile merges carry the usual merge-order dependence
    within their rank-error bounds (like python ``TDigest.merge`` /
    ``KLL.merge``).  NULL blobs are skipped; a group of only NULLs yields a
    SQL NULL sketch, while legitimate EMPTY stored sketches survive as
    empty sketches."""
    if kind not in _MERGE_CLASSES:
        raise ValueError(f"unknown sketch kind {kind!r}; expected one of {tuple(_MERGE_CLASSES)}")
    cls_name, blob_fn = _MERGE_CLASSES[kind]
    by = list(by or [])
    spark = df.sparkSession
    acol = _sibling_udaf_column(spark, F.col(sketch_col), cls_name, [], encoder="binary")
    gb = df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()
    agged = gb.agg(acol.alias("__blob"))

    @pandas_udf("binary")
    def fin(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda v: None if v is None else blob_fn(v))

    out = agged.select(*by, fin(F.col("__blob")).alias("sketch"))
    return out if sketch_col == "sketch" else out.withColumnRenamed("sketch", sketch_col)
