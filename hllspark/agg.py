"""Two-phase distributed sketch aggregation — the scale path.

This reproduces the reference's Greenplum distributed-aggregation contract
(sfunc per segment → motion → prefunc register-max → finalfunc,
sql/greenplum.sql:289-295, SURVEY.md §3.2) with explicit Spark stages,
because Spark's pandas GROUPED_AGG UDAFs have no map-side partial
aggregation (they shuffle raw rows):

  phase 1  mapInPandas      one partial sketch per (input partition, group);
                            Arrow batches hashed with numpy, no per-row Python
  shuffle  Exchange         partial sketches only — P×G rows of ≤16 KiB, not
                            raw rows; this is what tames skew: a hot group
                            costs P sketches, not N rows
  phase 2  applyInPandas /  register-max merge (associative+commutative →
           tree fan-in      any arrival order gives byte-identical registers)

Skew note: because phase 1 collapses each partition to one sketch per group,
a hot key ('en' at 55% of a Common-Crawl table) shuffles the same number of
bytes as a cold key.  For extreme partition counts, `merge_rounds=2` (default
when the input has >256 partitions) pre-merges partials in buckets of
`pmod(partition_id, sqrt(P))` before the final per-key merge, bounding any
single reducer's fan-in — the salted-repartition pattern with merge
associativity guaranteeing correctness.
"""

from __future__ import annotations

import math
import time
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .core.hash import hash_arrow_array
from .core.hll import HLL, decode_encodes, merge_blobs
from .functions import DEFAULT_B, DEFAULT_BINBITS, hll_estimate, hll_estimate_bigint

LINEAGE_FIELDS = [
    StructField("partition_id", IntegerType(), False),
    StructField("rows_seen", LongType(), False),
    StructField("nulls_skipped", LongType(), False),
    StructField("wall_ms", DoubleType(), False),
]


def _partial_schema(df: DataFrame, by: Sequence[str], lineage: bool) -> StructType:
    fields = [df.schema[c] for c in by]
    fields.append(StructField("sketch", BinaryType(), True))
    if lineage:
        fields.extend(LINEAGE_FIELDS)
    return StructType(fields)


def _make_builder(
    value_col: str,
    by: Sequence[str],
    b: int,
    binbits: int,
    input_type: str,
    lineage: bool,
    hash_kind: int = 0,
    factory=None,
):
    """Per-partition partial-sketch builder (the reference's sfunc, run over
    Arrow batches: hyperloglog_add_item_agg_default, hyperloglog_counter.c:495-554).

    Runs as mapInArrow — raw Arrow RecordBatches, no pandas conversion — so
    int64 columns with NULLs keep exact values (Spark's pandas conversion
    would degrade them to float64) and string hashing reads the Arrow
    buffers zero-copy.  ``factory`` overrides the per-group state
    constructor — any object with ``update_arrow(arr, input_type)`` /
    ``merge`` / ``to_bytes`` works (the Sketch protocol of hllspark.sketches).
    """

    def build(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark import TaskContext

        t0 = time.monotonic()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        rows_seen = 0
        nulls = 0
        states: dict = {}
        touched: set = set()  # keys that received ≥1 non-NULL value
        key_arrays: list[pa.Array] | None = None

        for batch in batches:
            rows_seen += batch.num_rows
            vcol = batch.column(batch.schema.get_field_index(value_col))
            nnull = vcol.null_count
            nulls += nnull
            make_state = factory if factory is not None else (
                lambda: HLL.create(b=b, binbits=binbits, hash_kind=hash_kind)
            )
            if not by:
                st = states.get(())
                if st is None:
                    st = states[()] = make_state()
                nn = vcol.drop_null() if nnull else vcol
                if len(nn):
                    st.update_arrow(nn, input_type)
                    touched.add(())
                continue
            if batch.num_rows == 0:
                continue
            # hash-based fast path: hash all non-null values once, slice per
            # group; generic sketches get per-group arrow takes instead
            nn = vcol.drop_null() if nnull else vcol
            if factory is None:
                hashes = hash_arrow_array(nn, input_type) if len(nn) else None
            else:
                hashes = None
            if nnull:
                valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
                nn_pos = np.full(batch.num_rows, -1, dtype=np.int64)
                nn_pos[valid] = np.arange(len(nn))
            else:
                nn_pos = None
            # group the batch by key → (group key, row positions) pairs
            if len(by) == 1:
                # arrow-native single-key path: dictionary-encode
                # (~10× cheaper than pandas groupby on strings per batch)
                dict_arr = pc.dictionary_encode(batch.column(batch.schema.get_field_index(by[0])))
                indices = dict_arr.indices
                uniq = dict_arr.dictionary
                null_code = len(uniq)
                if indices.null_count:
                    indices = indices.fill_null(null_code)
                codes = indices.to_numpy(zero_copy_only=False).astype(np.int64)
                order = np.argsort(codes, kind="stable")
                bounds = np.searchsorted(codes[order], np.arange(null_code + 2))
                group_iter = (
                    ((uniq[ci].as_py(),) if ci < null_code else (None,), order[bounds[ci] : bounds[ci + 1]])
                    for ci in range(null_code + 1)
                    if bounds[ci + 1] > bounds[ci]
                )
            else:
                keys_pdf = batch.select(list(by)).to_pandas()
                group_iter = (
                    (key if isinstance(key, tuple) else (key,), idx)
                    for key, idx in keys_pdf.groupby(list(by), sort=False, dropna=False).indices.items()
                )
            for k, idx in group_iter:
                st = states.get(k)
                if st is None:
                    st = states[k] = make_state()
                if nn_pos is not None:
                    hidx = nn_pos[idx]
                    hidx = hidx[hidx >= 0]
                else:
                    hidx = idx
                if len(hidx) == 0:
                    continue
                touched.add(k)
                if hashes is not None:
                    st.add_hashes(hashes[hidx])
                elif factory is not None:
                    st.update_arrow(nn.take(pa.array(hidx)), input_type)
            if key_arrays is None:
                key_arrays = [batch.column(batch.schema.get_field_index(c)) for c in by]

        wall_ms = (time.monotonic() - t0) * 1000.0
        if not states:
            return
        keys = list(states.keys())
        arrays = []
        names = []
        for i, c in enumerate(by):
            typ = key_arrays[i].type if key_arrays is not None else None
            vals = [None if v is None or v != v else v for v in (k[i] for k in keys)]  # NaN/NaT → null
            arrays.append(pa.array(vals, type=typ))
            names.append(c)
        # NULL contract (hyperloglog_counter.c:218-220, 511-513): a group whose
        # every value was NULL yields SQL NULL, not an empty sketch — for
        # HLL AND the sibling sketches (they "follow the HLL contract",
        # sketches/__init__), so every engine produces the same row set.
        # HLL partials ship group-varint-compressed sparse payloads (the
        # hyperloglog_comp finalfunc role, greenplum.sql:327): ~2.6 B/entry
        # instead of 4 on the partial shuffle; the merge phase re-expands.
        def emit(k):
            if k not in touched:
                return None
            if factory is not None:
                return states[k].to_bytes()
            return states[k].to_bytes(compress=True)

        arrays.append(pa.array([emit(k) for k in keys], type=pa.binary()))
        names.append("sketch")
        if lineage:
            n = len(keys)
            arrays += [
                pa.array([pid] * n, type=pa.int32()),
                pa.array([rows_seen] * n, type=pa.int64()),
                pa.array([nulls] * n, type=pa.int64()),
                pa.array([wall_ms] * n, type=pa.float64()),
            ]
            names += ["partition_id", "rows_seen", "nulls_skipped", "wall_ms"]
        yield pa.RecordBatch.from_arrays(arrays, names=names)

    return build


def _merge_rows_obj(sketches: Iterable, cls=HLL):
    """Fold serialized sketches → one sketch object (None if all NULL).

    HLL takes the vectorized batch union (core.hll.merge_blobs — one numpy
    pass per batch instead of a per-blob decode+merge, ~20× at 10^5 stored
    sketches); sibling classes keep the generic sequential fold."""
    if cls is HLL:
        return merge_blobs(sketches)
    acc = None
    for v in sketches:
        if v is None:
            continue
        s = cls.from_bytes(bytes(v))
        acc = s if acc is None else acc.merge(s)
    return acc


def _merge_rows(sketches: Iterable, cls=HLL) -> bytes | None:
    acc = _merge_rows_obj(sketches, cls)
    return None if acc is None else acc.to_bytes()


_STRINGY = ("string", "binary")
_NARROW_INTS = ("tinyint", "smallint", "int", "boolean")


def canon_xxhash_col(df: DataFrame, value_col: str):
    """Column expression to feed F.xxhash64, with narrow integral types cast
    to LongType first.

    Spark's xxhash64 dispatches per SQL type (IntegerType → 4-byte path,
    LongType → 8-byte path).  Python-side probes of a JVM-built sketch
    (cm_query / bloom_contains / driver adds) receive pandas batches where
    the SQL type is unrecoverable — an int64 column *with NULLs* arrives as
    float64 — so per-type probe dispatch is impossible to get right.  The
    fix is at the source: every JVM hashing entry point canonicalizes
    byte/short/int/boolean → long, making 'integral values hash via the
    8-byte path' a representation-independent invariant on both sides.
    """
    col = F.col(value_col)
    if _sql_dtype(df, value_col) in _NARROW_INTS:
        col = col.cast("long")
    return col


def pd_keyrow(pdf: pd.DataFrame, by: Sequence[str]) -> dict:
    """First row's group-key values for an applyInPandas return, with
    pandas' degraded NULLs (NaN/NaT/pd.NA on nullable dtypes) normalized
    back to None.  Shared by every per-key assembly (HLL distributed pass
    and the sibling JVM builders) so NULL-key handling has one home."""
    out = {}
    for c in by:
        v = pdf[c].iloc[0]
        out[c] = [None if pd.isna(v) else v]
    return out


def _sql_dtype(df: DataFrame, value_col: str) -> str:
    """Column dtype resolved the way Spark resolves names (case-insensitive
    by default) — a dict(df.dtypes) lookup misses case variants and would
    silently skip canonicalization, diverging builder and probe hashes."""
    return df.select(value_col).schema[0].dataType.simpleString()


def jvm_hash_expr(df: DataFrame, value_col: str):
    """NULL-preserving, type-canonicalized JVM hash of a column
    (xxhash64 of NULL would yield the seed, so guard explicitly).

    The integral canonicalization is part of the hash_kind=1 DEFINITION for
    STRUCT_VERSION 2 sketches: narrow ints always hash in the 8-byte long
    domain.  Any future change to this domain must bump the version — mixed
    domains under one hash_kind merge without error and silently double-
    count."""
    col = canon_xxhash_col(df, value_col)
    return F.when(F.col(value_col).isNull(), None).otherwise(F.xxhash64(col))


def _apply_jvm_prehash(df: DataFrame, value_col: str, by: Sequence[str], jvm_prehash) -> tuple[DataFrame, str, str, int]:
    """Optionally replace a string/binary value column with its JVM-side
    xxhash64 (whole-stage-codegen).  Only 8 bytes/row then cross the
    JVM→Python Arrow boundary instead of the raw payload — at web scale this
    is the difference between shipping terabytes of text into Python workers
    and shipping a fixed-width hash column.  Resulting sketches carry
    hash_kind=HASH_XXHASH_SPARK and refuse to merge with murmur-built ones.
    """
    from .core.hll import HASH_XXHASH_SPARK

    if jvm_prehash == "auto":
        jvm_prehash = _sql_dtype(df, value_col) in _STRINGY
    if not jvm_prehash:
        return df, value_col, "auto", 0
    hcol = f"__hll_h_{value_col}"
    df = df.select(*by, jvm_hash_expr(df, value_col).alias(hcol))
    return df, hcol, "prehashed64", HASH_XXHASH_SPARK


def build_partials(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    b: int | None = None,
    binbits: int | None = None,
    input_type: str = "auto",
    lineage: bool = True,
    jvm_prehash="auto",
    factory=None,
    error_rate: float | None = None,
    ndistinct: float | None = None,
) -> DataFrame:
    """Phase 1 only: one partial sketch per (partition, group) with lineage.

    Exposed separately so callers can persist partials as a checkpoint
    (hllspark.io) — the stored-counter workflow of README.md:135-166.
    ``factory`` switches the state type to any Sketch-protocol object.
    """
    from .functions import resolve_params

    b, binbits = resolve_params(b, binbits, error_rate, ndistinct)
    by = list(by or [])
    hash_kind = 0
    if input_type == "auto" and (factory is None or jvm_prehash is True):
        # for custom factories, prehash only on explicit request (the factory
        # must then construct its sketches with hash_kind=HASH_XXHASH_SPARK)
        df, value_col, input_type, hash_kind = _apply_jvm_prehash(
            df.select(*by, value_col), value_col, by, True if factory is not None else jvm_prehash
        )
    cols = by + [value_col]
    schema = _partial_schema(df.select(*cols), by, lineage)
    return df.select(*cols).mapInArrow(
        _make_builder(value_col, by, b, binbits, input_type, lineage, hash_kind, factory), schema=schema
    )


def merge_partials(
    partials: DataFrame,
    by: Sequence[str] | None = None,
    fanin: int = 64,
    merge_rounds: int | None = None,
    sketch_col: str = "sketch",
    cls=HLL,
    engine: str = "auto",
) -> DataFrame:
    """Phase 2: register-max merge of partial sketches (the prefunc,
    hyperloglog_merge_agg → hll_merge, hyperloglog.c:251-337).

    engine="auto" (HLL sketches, default topology, jar loadable) routes the
    whole reduction through the JVM blob-merge aggregate buffer
    (jvm_udaf.hll_merge_udaf — byte-identical results, tested; ~15× at 100k
    stored sketches).  Requesting an explicit ``merge_rounds`` topology, a
    non-HLL ``cls`` or ``engine="python"`` keeps the pandas merge paths:
    grouped = shuffle by key (optionally pre-bucketed when the partial count
    is huge); global = log-depth tree fan-in, never collecting all partials
    into one task until the fan-in is bounded.
    """
    by = list(by or [])
    if engine == "auto" and cls is HLL and merge_rounds is None and _udaf_available(partials.sparkSession):
        try:
            from . import jvm_udaf

            out = jvm_udaf.hll_merge_udaf(partials, sketch_col, by)
            return out if sketch_col == "sketch" else out.withColumnRenamed("sketch", sketch_col)
        except RuntimeError:
            pass  # version-skewed jar without the merge class → python path
    out_fields = [f for f in partials.schema.fields if f.name in by]
    out_fields.append(StructField(sketch_col, BinaryType(), True))
    out_schema = StructType(out_fields)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {c: [pdf[c].iloc[0]] for c in by}
        row[sketch_col] = [_merge_rows(pdf[sketch_col], cls)]
        return pd.DataFrame(row)

    def merge_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: HLL | None = None
        for pdf in batches:
            s = _merge_rows_obj(pdf[sketch_col], cls)
            if s is not None:
                acc = s if acc is None else acc.merge(s)
        if acc is not None:
            yield pd.DataFrame({sketch_col: [acc.to_bytes()]})

    # proxy for the partial count: cluster parallelism (avoids df.rdd, whose
    # DataFrame→RDD plan conversion costs ~1s of driver time per query)
    nparts = partials.sparkSession.sparkContext.defaultParallelism
    if by:
        if merge_rounds is None:
            merge_rounds = 2 if nparts > 256 else 1
        cur = partials.select(*by, sketch_col)
        if merge_rounds > 1:
            # pre-merge within hash buckets to bound per-key reducer fan-in
            nbuckets = max(2, int(math.sqrt(nparts)))
            bucket = F.pmod(F.crc32(F.concat_ws("", *[F.col(c).cast("string") for c in by])) + F.spark_partition_id(), F.lit(nbuckets))
            pre_schema = StructType(list(out_schema.fields) + [StructField("__bucket", IntegerType(), True)])

            def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
                row = {c: [pdf[c].iloc[0]] for c in by}
                row[sketch_col] = [_merge_rows(pdf[sketch_col], cls)]
                row["__bucket"] = [int(pdf["__bucket"].iloc[0])]
                return pd.DataFrame(row)

            cur = (
                cur.withColumn("__bucket", bucket.cast("int"))
                .groupBy(*by, "__bucket")
                .applyInPandas(merge_bucket, schema=pre_schema)
                .drop("__bucket")
            )
        return cur.groupBy(*by).applyInPandas(merge_group, schema=out_schema)

    def merge_partition_final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: HLL | None = None
        for pdf in batches:
            s = _merge_rows_obj(pdf[sketch_col], cls)
            if s is not None:
                acc = s if acc is None else acc.merge(s)
        # empty input → one NULL-sketch row, so hll_estimate_bigint gives 0
        # (the NULL contract of hyperloglog_get_estimate_bigint, postgres.sql:169-171)
        yield pd.DataFrame({sketch_col: [None if acc is None else acc.to_bytes()]})

    # global (keyless): partition-local pre-merge, then iterated fan-in —
    # depth ceil(log_fanin(P)).  The pre-merge is the map-side combine of
    # this reduction: one blob leaves each scan partition, so the exchange
    # below ships ≤ P sketches instead of every stored partial (measured
    # ~3× on a 100k-blob stored rollup: the repartition(1) final task was
    # otherwise fetching and merging all 100k rows alone).  mapInPandas is
    # narrow — it fuses into the scan stage, costing no extra exchange.
    # HLL only: its merge is order-free (state is a pure function of the
    # value set), so the extra fold level cannot change bytes; sibling
    # digest-mode merges (tdigest/kll) are order-dependent within the rank
    # bound and must keep the single-task row-order fold.
    sk_schema = StructType([StructField(sketch_col, BinaryType(), True)])
    cur = partials.select(sketch_col)
    if cls is HLL:
        cur = cur.mapInPandas(merge_partition, schema=sk_schema)
    n = nparts
    while n > fanin:
        n = max(1, math.ceil(n / fanin))
        cur = cur.repartition(n).mapInPandas(merge_partition, schema=sk_schema)
    # repartition, NOT coalesce: coalesce(1) would collapse the upstream
    # builder stage into a single task and serialize the whole scan
    return cur.repartition(1).mapInPandas(merge_partition_final, schema=sk_schema)


def merge_partials_driver(partials: DataFrame, by: Sequence[str] | None = None, sketch_col: str = "sketch", cls=HLL):
    """Collect partial sketches to the driver and merge in numpy.

    For P ≤ ~4096 partials (P × ≤16 KiB = a few MiB) this removes an entire
    Exchange + single-task stage + Python-worker round trip per query — the
    same role the coordinator's finalfunc plays in Greenplum (SURVEY.md §3.2).
    Returns a list of Rows-like tuples [(key..., sketch_bytes)].
    """
    by = list(by or [])
    acc: dict = {}
    for r in partials.select(*by, sketch_col).collect():
        k = tuple(r[c] for c in by)
        blob = r[sketch_col]
        if blob is None:
            # all-NULL partial: keep the key (its merged result may stay NULL)
            acc.setdefault(k, None)
            continue
        s = cls.from_bytes(bytes(blob))
        if acc.get(k) is not None:
            acc[k].merge(s)
        else:
            acc[k] = s
    return acc


def _udaf_available(spark) -> bool:
    """Can engine="jvm_udaf" run in this session?  Never raises — any
    failure (no jar, no JDK, zip-packaged install) routes auto back to the
    groupBy JVM engine.  Cached per session (hllspark.jvm_udaf)."""
    try:
        from . import jvm_udaf

        return jvm_udaf.available(spark)
    except Exception:
        return False


def sketch(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    b: int | None = None,
    binbits: int | None = None,
    input_type: str = "auto",
    fanin: int = 64,
    merge_rounds: int | None = None,
    jvm_prehash="auto",
    error_rate: float | None = None,
    ndistinct: float | None = None,
    engine: str = "auto",
) -> DataFrame:
    """groupBy(by).hyperloglog_accum(value_col): full two-phase pipeline →
    DataFrame[by..., sketch binary].  Precision via b/binbits or the
    reference-style (error_rate, ndistinct) derivation.

    ``engine``: "jvm_udaf" runs the reduction as a single JVM aggregate
    buffer (TypedImperativeAggregate via functions.udaf — the fastest
    shape, needs dist/hllspark-udaf.jar loadable in the session, see
    hllspark.jvm_udaf); "jvm" keeps the whole reduction in Catalyst as a
    groupBy(key, idx) hash aggregate (no jar needed) and assembles
    DISTRIBUTED — unbounded key cardinality, and global queries finalize in
    a single executor task under a dummy key (no driver-side assembly);
    "jvm_driver" forces driver-side assembly (lowest latency when the key
    count is known-small); "python" uses the mapInArrow builder (required
    for murmur reference-parity via input_type/jvm_prehash=False).  "auto"
    picks jvm_udaf when the jar loads, else jvm, unless something pins the
    hash function to murmur.  All three xxhash engines emit byte-identical
    sketches (tests/test_jvm_engine.py)."""
    if engine == "auto":
        if input_type == "auto" and jvm_prehash in ("auto", True):
            engine = "jvm_udaf" if _udaf_available(df.sparkSession) else "jvm"
        else:
            engine = "python"
    if engine == "jvm_udaf":
        from .jvm_udaf import sketch_jvm_udaf

        return sketch_jvm_udaf(df, value_col, by, b, binbits, error_rate, ndistinct)
    if engine == "jvm":
        return sketch_jvm_distributed(df, value_col, by or [], b, binbits, error_rate, ndistinct)
    if engine == "jvm_driver":
        return sketch_jvm(df, value_col, by, b, binbits, error_rate, ndistinct)
    partials = build_partials(
        df, value_col, by, b, binbits, input_type, lineage=False, jvm_prehash=jvm_prehash,
        error_rate=error_rate, ndistinct=ndistinct,
    )
    return merge_partials(partials, by, fanin=fanin, merge_rounds=merge_rounds)


def _resolve_grouping_sets(
    dims: Sequence[str], sets: Sequence[Sequence[str]] | None, mode: str
) -> tuple[list[str], list[list[str]]]:
    """Normalize CUBE / ROLLUP / explicit GROUPING SETS to a list of subsets
    of ``dims`` (each in canonical dim order — within-set order is
    semantically irrelevant).  grouping_id convention (Spark's): bit i
    counted from the MSB end corresponds to dims[i]; 1 = aggregated away."""
    dims = list(dims)
    if not dims:
        raise ValueError("sketch_cube needs at least one dim column")
    if len(set(dims)) != len(dims):
        raise ValueError(f"duplicate dim columns: {dims}")
    n = len(dims)
    if sets is not None:
        norm: list[list[str]] = []
        seen: set[tuple[str, ...]] = set()
        for s in sets:
            s = list(s)
            unknown = [c for c in s if c not in dims]
            if unknown:
                raise ValueError(f"grouping set {s} references non-dim columns {unknown}")
            canon = tuple(c for c in dims if c in s)
            if len(canon) != len(s):
                raise ValueError(f"duplicate columns inside grouping set {s}")
            if canon in seen:
                raise ValueError(f"duplicate grouping set {list(canon)}")
            seen.add(canon)
            norm.append(list(canon))
        if not norm:
            raise ValueError("sets must contain at least one grouping set")
        return dims, norm
    if mode == "cube":
        if n > 8:
            raise ValueError(
                f"cube over {n} dims expands every input row {2 ** n}x before the "
                "partial aggregate — pass the grouping sets you actually need via sets="
            )
        # gid-ascending order: gid's MSB-end bit i set == dims[i] aggregated away
        return dims, [
            [d for i, d in enumerate(dims) if not (gid >> (n - 1 - i)) & 1]
            for gid in range(2 ** n)
        ]
    if mode == "rollup":
        return dims, [dims[:k] for k in range(n, -1, -1)]
    raise ValueError(f"unknown mode {mode!r} (cube, rollup, or pass sets=)")


def _expand_grouping_sets(
    df: DataFrame,
    keep_cols: Sequence[str],
    dims: Sequence[str],
    resolved: Sequence[Sequence[str]],
    gid_col: str,
) -> DataFrame:
    """Replicate every row once per grouping set — the Catalyst-Expand
    equivalent for engines that aggregate via groupBy instead of
    ``df.groupingSets`` (which only accepts real aggregate expressions).
    ``explode(array(struct_per_set))`` is a Generate node: one scan, JVM-side
    row replication, rolled-up dims NULLed at their original type, and the
    set's grouping_id carried as a column — so a plain
    ``groupBy(*dims, gid_col)`` over the result computes every granularity
    in a single pass.  Same shuffle shape as the udaf cube path
    (|sets| × |keys| groups), |sets|-1 fewer source scans than a per-set
    union."""
    n = len(dims)
    dim_types = {f.name: f.dataType for f in df.schema.fields if f.name in dims}
    structs = []
    for s in resolved:
        gid = sum((1 << (n - 1 - i)) for i, d in enumerate(dims) if d not in s)
        structs.append(
            F.struct(
                *[
                    (F.col(d) if d in s else F.lit(None).cast(dim_types[d])).alias(d)
                    for d in dims
                ],
                F.lit(gid).cast("long").alias(gid_col),
            )
        )
    return df.select(*keep_cols, F.explode(F.array(*structs)).alias("_gs")).select(
        *keep_cols,
        *[F.col(f"_gs.{d}").alias(d) for d in dims],
        F.col(f"_gs.{gid_col}").alias(gid_col),
    )


def sketch_cube(
    df: DataFrame,
    value_col: str,
    dims: Sequence[str],
    sets: Sequence[Sequence[str]] | None = None,
    mode: str = "cube",
    b: int | None = None,
    binbits: int | None = None,
    error_rate: float | None = None,
    ndistinct: float | None = None,
    engine: str = "auto",
    finalize: str = "sketch",
    est_col: str = "est",
    gid_col: str = "grouping_id",
) -> DataFrame:
    """Multi-granularity sketch rollup: hyperloglog_accum under ``GROUP BY
    CUBE / ROLLUP / GROUPING SETS`` → DataFrame[dims..., grouping_id,
    sketch|est].  The reference's counters compose with any SQL GROUP BY for
    free (they're ordinary Postgres aggregates); this is the Spark
    DataFrame-level equivalent, building EVERY requested granularity of a
    sketch rollup table in one pass over the fact table.

    Aggregated-away dims are NULL and ``gid_col`` (Spark grouping_id: bit
    per dim, MSB = dims[0], 1 = rolled up) disambiguates them from actual
    NULL key values.  Cell sketches are byte-identical to a per-set
    ``agg.sketch(df, value_col, by=set)`` — merge determinism makes the
    canonical state a pure function of each cell's value set — so the output
    feeds every stored-sketch path (merge_stored, hll_merge_udaf re-agg,
    per-row read UDFs) like any other rollup table.

    Engines: "jvm_udaf" (Catalyst Expand replicates rows once per set
    BEFORE map-side combine, so the shuffle carries |sets| x |keys| buffers;
    needs the jar) or "jvm"/"python" (the same single-scan shape via an
    explode-based Expand — _expand_grouping_sets — then one grouped sketch
    over dims+grouping_id; no jar, identical bytes).  Every engine is one
    pass over the source.  One SQL-semantics edge: over an EMPTY input the
    udaf path (df.groupingSets) still emits the global-set row with a NULL
    sketch, while the groupBy engines emit no rows.
    "auto" prefers jvm_udaf.  Scale note: full cube is 2^n sets
    — at 100 TB pass sets= with the granularities a dashboard actually
    reads rather than cubing many dims (the Expand multiplier IS the cost
    model; guarded at n > 8)."""
    dims, resolved = _resolve_grouping_sets(dims, sets, mode)
    if value_col in dims:
        # would duplicate the column in df.select(value_col, *dims) and
        # surface later as a confusing ambiguous-reference analysis error
        raise ValueError(f"value_col {value_col!r} cannot also be a dim column")
    if engine == "auto":
        engine = "jvm_udaf" if _udaf_available(df.sparkSession) else "jvm"
    if finalize not in ("sketch", "estimate", "estimate_bigint"):
        raise ValueError(f"unknown finalize {finalize!r}")
    if engine == "jvm_udaf":
        from .jvm_udaf import sketch_cube_jvm_udaf

        return sketch_cube_jvm_udaf(
            df, value_col, dims, resolved, b, binbits, error_rate, ndistinct,
            finalize, est_col, gid_col,
        )
    expanded = _expand_grouping_sets(
        df.select(value_col, *dims), [value_col], dims, resolved, gid_col
    )
    out = sketch(
        expanded, value_col, by=[*dims, gid_col], b=b, binbits=binbits,
        error_rate=error_rate, ndistinct=ndistinct, engine=engine,
    )
    if finalize == "sketch":
        return out
    from .functions import hll_estimate, hll_estimate_bigint

    fin = hll_estimate if finalize == "estimate" else hll_estimate_bigint
    return out.select(*dims, gid_col, fin(F.col("sketch")).alias(est_col))


def distinct(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    b: int | None = None,
    binbits: int | None = None,
    input_type: str = "auto",
    bigint: bool = False,
    est_col: str = "est",
    jvm_prehash="auto",
    driver_merge: bool | str = "auto",
    engine: str = "auto",
    error_rate: float | None = None,
    ndistinct: float | None = None,
) -> DataFrame:
    """hyperloglog_distinct: sketch then estimate → DataFrame[by..., est].

    Precision via b/binbits or the reference's
    ``hyperloglog_distinct(col[, error_rate[, ndistinct]])`` derivation
    (postgres.sql:219-245) — same resolution as ``sketch``.

    ``driver_merge``: finalize small partial sets on the driver (coordinator
    finalfunc role) instead of an extra Spark stage.  "auto" enables it for
    global sketches on ≤256-way clusters; pass True for grouped queries whose
    key cardinality is known to be small (e.g. per-lang).

    NULL contract (hyperloglog_counter.c:511-513): a group with zero non-NULL
    values estimates NULL; ``bigint=True`` coalesces NULL→0
    (postgres.sql:169-171).
    """
    from .functions import resolve_params

    b, binbits = resolve_params(b, binbits, error_rate, ndistinct)
    by = list(by or [])
    spark = df.sparkSession
    if engine == "auto":
        if input_type == "auto" and jvm_prehash in ("auto", True):
            engine = "jvm_udaf" if _udaf_available(spark) else "jvm"
        else:
            engine = "python"
    if engine == "jvm_udaf":
        from .jvm_udaf import sketch_jvm_udaf

        return sketch_jvm_udaf(
            df, value_col, by, b, binbits,
            finalize="estimate_bigint" if bigint else "estimate", est_col=est_col,
        )
    if engine in ("jvm", "jvm_driver"):
        if engine == "jvm":
            # distributed assembly emits estimates directly inside the
            # per-key finalize — no extra Python-UDF job over the sketches.
            # Global queries take the same path under a dummy key (no
            # driver-side assembly anywhere in the default engine).
            return sketch_jvm_distributed(
                df, value_col, by, b, binbits,
                finalize="estimate_bigint" if bigint else "estimate", est_col=est_col,
            )
        # forced driver assembly: states already live on the
        # driver — estimate in numpy, skip the Spark estimate job entirely
        states = _sketch_jvm_states(df, value_col, by, b, binbits)
        if not by and not states:
            states = {(): None}
        rows = []
        for k, s in sorted(states.items(), key=lambda kv: tuple(str(x) for x in kv[0])):
            e = None if s is None else s.estimate()
            if bigint:
                rows.append((*k, 0 if e is None else int(round(e))))
            else:
                rows.append((*k, None if e is None else float(e)))
        schema_fields = _nullable_key_fields(df, by) + [
            StructField(est_col, LongType() if bigint else DoubleType(), not bigint)
        ]
        return spark.createDataFrame(rows, StructType(schema_fields))
    if driver_merge == "auto":
        driver_merge = not by and spark.sparkContext.defaultParallelism <= 256
    if driver_merge:
        partials = build_partials(df, value_col, by, b, binbits, input_type, lineage=False, jvm_prehash=jvm_prehash)
        acc = merge_partials_driver(partials, by)
        if not by and not acc:
            acc = {(): None}
        rows = []
        for k, s in sorted(acc.items(), key=lambda kv: tuple(str(x) for x in kv[0])):
            e = None if s is None else s.estimate()
            if bigint:
                rows.append((*k, 0 if e is None else int(round(e))))
            else:
                rows.append((*k, None if e is None else float(e)))
        schema_fields = _nullable_key_fields(df, by) + [
            StructField(est_col, LongType() if bigint else DoubleType(), not bigint)
        ]
        return spark.createDataFrame(rows, StructType(schema_fields))
    sk = sketch(df, value_col, by, b, binbits, input_type, jvm_prehash=jvm_prehash)
    est = hll_estimate_bigint(F.col("sketch")) if bigint else hll_estimate(F.col("sketch"))
    cols = by + [est.alias(est_col)]
    return sk.select(*cols)


def sketch_generic(
    df: DataFrame,
    value_col: str,
    factory,
    cls,
    by: Sequence[str] | None = None,
    input_type: str = "auto",
    fanin: int = 64,
    merge_rounds: int | None = None,
    jvm_prehash: bool = False,
) -> DataFrame:
    """Two-phase pipeline for ANY Sketch-protocol class (count-min, Bloom,
    t-digest, KLL, MinHash, ...): same partial/merge topology as HLL.

    ``factory``: zero-arg constructor for a fresh state (e.g.
    ``lambda: CountMin.create(width=4096, depth=5)``); ``cls`` provides
    ``from_bytes`` for the merge phase.  ``jvm_prehash=True`` hashes the
    value column JVM-side with xxhash64 (8 bytes/row into Python) — the
    factory must then create sketches with hash_kind=HASH_XXHASH_SPARK so
    probes use the matching hash (hllspark.core.xxhash).
    """
    partials = build_partials(
        df, value_col, by, input_type=input_type, lineage=False, factory=factory, jvm_prehash=jvm_prehash
    )
    return merge_partials(partials, by, fanin=fanin, merge_rounds=merge_rounds, cls=cls)


def salted_repartition(df: DataFrame, keys: Sequence[str], num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Repartition by (keys..., salt) so one hot key fans out across
    ``salt_buckets`` partitions (SURVEY.md §4 skew control).

    The sketch pipeline itself doesn't need this — phase 1 collapses rows to
    per-partition sketches before any shuffle — but raw-row operations that
    must shuffle by a skewed key (e.g. a groupBy feeding a non-mergeable
    computation) can pre-salt with this helper; merge associativity (or any
    reassociable aggregate) makes the two-level collapse correct.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in keys], F.spark_partition_id()), F.lit(salt_buckets))
    return df.repartition(num_partitions, *[F.col(c) for c in keys], salt)


# ---------------------------------------------------------------------------
# JVM-native engine: the register reduction as a Catalyst hash aggregate
# ---------------------------------------------------------------------------


def _bitlen_case(x, maxbits: int):
    """Exact bit length of a small (< 2^maxbits) non-negative value as a
    CASE cascade — pure integer comparisons, whole-stage-codegen friendly.
    Tests descend from the high bit, so for uniform inputs the expected
    number of comparisons is ~2 (geometric distribution)."""
    expr = F.lit(0)
    for k in range(1, maxbits + 1):
        expr = F.when(x >= (1 << (k - 1)), k).otherwise(expr)
    return expr


def _with_jvm_kernels(df: DataFrame, hcol: str, b: int, binbits: int) -> DataFrame:
    """Append bit-exact HLL kernel columns (__idx, __rho, __enc, __chain)
    computed from a 64-bit hash column entirely with integer Catalyst ops:

    - clz64 of the p'-suffix as 64 − popcount after OR-propagating the
      leading bit right (6 shift|or steps, then one bit_count).  The steps
      are expressed as LATERAL column aliases in a single selectExpr:
      linear-size generated code (JIT-friendly, unlike a 64-branch CASE
      whose bytecode exceeds HotSpot's JIT limits) with no exponential
      subtree duplication (unlike inlining) and no 12-deep withColumn
      chain (whose nested-Project analysis cost ~1s of driver time/query).
    - dense rho recovered losslessly from the p'-prefix structure:
      if any of bits [b, p') is set, rho = (p'-b) - bitlen(prefix&mask) + 1,
      else rho = (p'-b) + rho_p (encode_hash decode identity, SURVEY §2.6)
    - __chain marks the rho-overflow rehash case (all suffix bits zero)

    Validated bit-for-bit against the numpy kernels (tests/test_jvm_engine).
    """
    pprime = 32 - 1 - binbits
    mask = (1 << (pprime - b)) - 1
    h = F.col(hcol)

    out = df.selectExpr(
        "*",
        f"shiftleft({hcol}, {pprime}) AS __y0",
        "__y0 | shiftrightunsigned(__y0, 1) AS __y1",
        "__y1 | shiftrightunsigned(__y1, 2) AS __y2",
        "__y2 | shiftrightunsigned(__y2, 4) AS __y3",
        "__y3 | shiftrightunsigned(__y3, 8) AS __y4",
        "__y4 | shiftrightunsigned(__y4, 16) AS __y5",
        "__y5 | shiftrightunsigned(__y5, 32) AS __y6",
    )
    y = F.col("__y6")  # popcount(y) == bitlen(suffix); y == 0 ⟺ suffix == 0
    idx_p = F.shiftrightunsigned(h, 64 - pprime)
    prefix_bits = idx_p.bitwiseAND(F.lit(mask))
    rho_p = F.when(y == 0, F.lit(64)).otherwise(F.lit(65) - F.bit_count(y))
    enc = F.when(prefix_bits != 0, idx_p * 2).otherwise((idx_p * (1 << binbits) + rho_p) * 2 + 1)
    rho = F.when(
        prefix_bits != 0, F.lit(pprime - b + 1) - _bitlen_case(prefix_bits, pprime - b)
    ).otherwise(F.lit(pprime - b) + rho_p)
    keep = [c for c in df.columns]
    return out.select(
        *keep,
        F.shiftrightunsigned(h, 64 - b).alias("__idx"),
        rho.alias("__rho"),
        enc.alias("__enc"),
        (y == 0).alias("__chain"),
    )


def _jvm_exprs(h, b: int, binbits: int):
    """Single-expression variants (bin()-based clz) kept for validation —
    the production path uses _with_jvm_kernels (integer cascade)."""
    pprime = 32 - 1 - binbits
    mask = (1 << (pprime - b)) - 1
    idx = F.shiftrightunsigned(h, 64 - b)
    sh_b = F.shiftleft(h, b)
    rho = F.when(sh_b == 0, F.lit(64)).otherwise(F.lit(65) - F.length(F.bin(sh_b)))
    idx_p = F.shiftrightunsigned(h, 64 - pprime)
    sh_p = F.shiftleft(h, pprime)
    rho_p = F.when(sh_p == 0, F.lit(64)).otherwise(F.lit(65) - F.length(F.bin(sh_p)))
    enc = F.when(idx_p.bitwiseAND(F.lit(mask)) != 0, idx_p * 2).otherwise(
        (idx_p * (1 << binbits) + rho_p) * 2 + 1
    )
    # rho chain triggers iff every bit after the p' prefix is zero
    # (hll_add_hash_dense/encode_hash rehash loops, hyperloglog.c:611-620,694-703)
    chain = sh_p == 0
    return idx, rho, enc, chain


def _nullable_key_fields(df: DataFrame, by: Sequence[str]) -> list[StructField]:
    """Key fields with nullability forced on: group keys can be NULL even
    when the source column is declared non-nullable downstream of a join."""
    return [StructField(c, df.schema[c].dataType, True) for c in by]


def _semi_join_keys(left: DataFrame, keys_df: DataFrame, by: Sequence[str], broadcast: bool = True) -> DataFrame:
    """left_semi join on the key columns with NULL-SAFE equality: NULL group
    keys are real groups (SQL GROUP BY keeps them), and a plain equi-join
    would silently drop every row of a NULL-key group."""
    right = F.broadcast(keys_df) if broadcast else keys_df
    cond = None
    for c in by:
        e = left[c].eqNullSafe(keys_df[c])
        cond = e if cond is None else cond & e
    return left.join(right, on=cond, how="left_semi")


def _hll_kernel_frames(df: DataFrame, value_col: str, by: Sequence[str], b: int, binbits: int):
    """Shared front half of the JVM engines: NULL-preserving canonicalized
    xxhash64, kernel columns, and the register reduction

        groupBy(key, idx).agg(max(rho), sum(chain))

    — a pure whole-stage-codegen HashAggregate (no collect_list, which would
    force the slower ObjectHashAggregate path on 100% of rows to serve a
    2^-44-probability case).  Chain hashes, when the count says any exist,
    are fetched by a dedicated filter pass instead.

    NULL values keep a NULL hash and flow through as a (key, NULL idx) row —
    that's how all-NULL groups still surface (to yield a NULL sketch, the
    reference's NULL contract) without an extra key scan.
    """
    h = jvm_hash_expr(df, value_col)
    hdf_all = _with_jvm_kernels(df.select(*by, h.alias("__h")), "__h", b, binbits)
    # chain rows (probability ~2^-(63-binbits) per row): the C semantics
    # REPLACE rho with the rehash-chain result (which may be < 64), so these
    # rows are excluded from the JVM max and replayed through the exact
    # python kernels during assembly.
    regs = (
        hdf_all.select(
            *by,
            "__idx",
            F.when(~F.col("__chain"), F.col("__rho")).alias("__rho"),
            F.col("__chain").cast("int").alias("__c"),
        )
        .groupBy(*by, "__idx")
        .agg(F.max("__rho").alias("__rho"), F.sum("__c").alias("__nchain"))
    )
    return hdf_all, regs


def _sketch_jvm_states(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    b: int | None = None,
    binbits: int | None = None,
) -> dict:
    """Driver-side assembly of the JVM reduction → {key tuple: HLL | None}.

    None marks an all-NULL group (reference NULL contract).  Key values are
    extracted from Arrow (``to_pylist``), NOT pandas — pandas would turn a
    NULL in an int64 key column into NaN and degrade the whole column to
    float64, corrupting exact key round-trips.
    """
    from .core.hll import HASH_XXHASH_SPARK, sparse_capacity
    from .functions import resolve_params

    b, binbits = resolve_params(b, binbits)
    by = list(by or [])
    spark = df.sparkSession
    cap = sparse_capacity(b)

    hdf_all, regs = _hll_kernel_frames(df, value_col, by, b, binbits)
    hdf = hdf_all.filter(~F.col("__chain"))

    tbl = regs.toArrow()  # columnar fetch — ~100× cheaper than Row collect
    n = tbl.num_rows
    if n > 20_000_000:
        raise ValueError(
            f"sketch_jvm collected {n:,} register rows — group-key "
            "cardinality is too high for driver-side assembly; use "
            "sketch_jvm_distributed (unbounded keys) or engine='python'"
        )
    keys_list = list(zip(*(tbl.column(c).to_pylist() for c in by))) if by else [()] * n
    # __idx/__rho/__nchain are small ints — exact through float64-with-NaN
    idx_np = tbl.column("__idx").to_numpy(zero_copy_only=False).astype(np.float64)
    rho_np = tbl.column("__rho").to_numpy(zero_copy_only=False).astype(np.float64)
    nchain_np = tbl.column("__nchain").to_numpy(zero_copy_only=False).astype(np.float64)

    per_key: dict = {}
    for k in keys_list:
        per_key.setdefault(k, [])
    valid = ~np.isnan(rho_np)
    for j in np.nonzero(valid)[0]:
        per_key[keys_list[j]].append((int(idx_np[j]), int(rho_np[j])))

    # rho-overflow chain replay: only when the aggregate says any exist
    chain_map: dict = {}
    if np.nansum(nchain_np) > 0:
        ct = hdf_all.filter(F.col("__chain")).select(*by, "__h").toArrow()
        ckeys = list(zip(*(ct.column(c).to_pylist() for c in by))) if by else [()] * ct.num_rows
        for k, hv in zip(ckeys, ct.column("__h").to_pylist()):
            chain_map.setdefault(k, []).append(hv)

    # keys that might still be sparse: ≤ capacity nonzero registers
    maybe_sparse = [k for k, rows in per_key.items() if len(rows) <= cap]
    sparse_encs: dict = {}
    if maybe_sparse and cap > 0:
        if by:
            keys_df = spark.createDataFrame(
                [tuple(k) for k in maybe_sparse], StructType(_nullable_key_fields(df, by))
            )
            target = _semi_join_keys(hdf, keys_df, by)
        else:
            target = hdf
        enc_tbl = target.select(*by, "__enc").distinct().toArrow()
        ekeys = list(zip(*(enc_tbl.column(c).to_pylist() for c in by))) if by else [()] * enc_tbl.num_rows
        for k, e in zip(ekeys, enc_tbl.column("__enc").to_pylist()):
            sparse_encs.setdefault(k, []).append(e)

    out: dict = {}
    for k, rows in per_key.items():
        encs = sparse_encs.get(k)
        chains = chain_map.get(k)
        if not rows and encs is None and not chains:
            # key whose every value was NULL → SQL NULL sketch
            # (hyperloglog_counter.c:511-513)
            out[k] = None
            continue
        if (encs is not None or not rows) and len(encs or ()) <= cap and len(rows) <= cap:
            # includes the chain-only key (rows and encodings both empty):
            # start from the empty SPARSE state so the byte form matches the
            # python engine and the distributed assembly
            sk = HLL(
                b, binbits, np.unique(np.array(encs or [], dtype=np.int64).astype(np.uint32)), None, HASH_XXHASH_SPARK
            )
        else:
            dense = np.zeros(1 << b, dtype=np.uint8)
            if rows:
                ii = np.array([x[0] for x in rows], dtype=np.int64)
                rr = np.array([x[1] for x in rows], dtype=np.int64)
                np.maximum.at(dense, ii, np.minimum(rr, 255).astype(np.uint8))
            sk = HLL(b, binbits, None, dense, HASH_XXHASH_SPARK)
        if chains:
            sk.add_hashes(np.array(chains, dtype=np.int64).view(np.uint64))
        out[k] = sk
    return out


def sketch_jvm(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    b: int | None = None,
    binbits: int | None = None,
    error_rate: float | None = None,
    ndistinct: float | None = None,
) -> DataFrame:
    """Two-phase HLL with the ENTIRE hot path in whole-stage-codegen JVM:

      xxhash64(value) → groupBy(key, idx).agg(max(rho), sum(chain))
                                                         [Catalyst partial agg:
                                                          shuffle ≤ P × 2^b rows]
      keys with ≤capacity nonzero registers → targeted distinct-encode pass
                                                          (exact sparse content)
      rho-overflow rows (probability 2^-(63-binbits-b)) → dedicated replay
                                                          pass, only if the
                                                          chain count says so

    Python only assembles the final ≤2^b rows per key into canonical sketch
    bytes — byte-identical to the python engine's jvm_prehash path (tested),
    so sketches from either engine merge freely.

    Scale envelope: assembly is driver-side, so this engine suits low-to-
    moderate group-key cardinality (≲10^4 keys × ≤2^b register rows).  For
    high-cardinality grouping (per-domain, per-user) the default engine
    routes to sketch_jvm_distributed; a hard guard here fails loudly rather
    than silently OOMing the driver.
    """
    from .functions import resolve_params

    b, binbits = resolve_params(b, binbits, error_rate, ndistinct)
    by = list(by or [])
    spark = df.sparkSession
    states = _sketch_jvm_states(df, value_col, by, b, binbits)
    if not by and not states:
        states = {(): None}  # aggregate over zero rows yields SQL NULL
    schema = StructType(_nullable_key_fields(df, by) + [StructField("sketch", BinaryType(), True)])
    rows_out = [
        (*k, None if sk is None else sk.to_bytes())
        for k, sk in sorted(states.items(), key=lambda kv: tuple(str(x) for x in kv[0]))
    ]
    return spark.createDataFrame(rows_out, schema)


def sketch_jvm_distributed(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    b: int | None = None,
    binbits: int | None = None,
    error_rate: float | None = None,
    ndistinct: float | None = None,
    finalize: str = "sketch",
    est_col: str = "est",
) -> DataFrame:
    """sketch_jvm with DISTRIBUTED assembly — same JVM-native reduction, but
    sketches are built inside applyInPandas per key, so group-key cardinality
    is unbounded (the per-key state is ≤2^b register rows or ≤capacity
    encodes).  Byte-identical output to sketch_jvm (tested).

      pass 1: groupBy(key, idx).agg(max(rho), sum(chain)) → applyInPandas:
              keys with more than `capacity` nonzero registers (and no chain
              rows) become dense sketches here; all-NULL keys become NULL
      pass 2: the remaining (maybe-sparse or chained) keys get a targeted
              distinct-encode pass, unioned with their rare chain rows,
              and assemble as canonical sparse (or decode-dense) sketches;
              skipped entirely when pass 1 finished every key

    ``finalize``: "sketch" emits canonical bytes; "estimate" /
    "estimate_bigint" emit the estimate directly from the per-key finalize
    (saving a whole Python-UDF job for distinct()-style queries).
    """
    from .core.hll import HASH_XXHASH_SPARK, sparse_capacity
    from .functions import resolve_params

    b, binbits = resolve_params(b, binbits, error_rate, ndistinct)
    by = list(by or [])
    if not by:
        # Global aggregate: run the SAME distributed finalize under a dummy
        # constant key — the ≤2^b register rows shuffle to one finalize task
        # instead of a driver toArrow + assembly + result job (the last
        # ~0.6 s of the DataSketches comparator gap).  A 1-row left join
        # restores the zero-input-rows → SQL NULL aggregate contract
        # (hyperloglog_counter.c:511-513) that a vanished dummy group would
        # otherwise lose.
        g = "__hllspark_g"
        inner = sketch_jvm_distributed(
            df.withColumn(g, F.lit(True)), value_col, [g], b, binbits,
            finalize=finalize, est_col=est_col,
        )
        one = df.sparkSession.range(1).select(F.lit(True).alias(g))
        out = one.join(F.broadcast(inner), on=g, how="left").drop(g)
        if finalize == "estimate_bigint":
            out = out.withColumn(est_col, F.coalesce(F.col(est_col), F.lit(0)))
        return out
    cap = sparse_capacity(b)
    bb, bbin = b, binbits

    hdf_all, regs = _hll_kernel_frames(df, value_col, by, b, binbits)
    hdf = hdf_all.filter(~F.col("__chain"))

    if finalize == "sketch":
        out_field = StructField("sketch", BinaryType(), True)
    elif finalize == "estimate":
        out_field = StructField(est_col, DoubleType(), True)
    elif finalize == "estimate_bigint":
        # nullable: pass-1 defer rows carry None in this slot before pass 2
        out_field = StructField(est_col, LongType(), True)
    else:
        raise ValueError(f"unknown finalize {finalize!r}")

    def emit(sk: HLL | None):
        if finalize == "sketch":
            return None if sk is None else sk.to_bytes()
        e = None if sk is None else sk.estimate()
        if finalize == "estimate_bigint":
            return 0 if e is None else int(round(e))
        return e

    def keyrow(pdf: pd.DataFrame) -> dict:
        return pd_keyrow(pdf, by)

    key_fields = _nullable_key_fields(df, by)
    # __defer: 0 = finished in pass 1; 1 = maybe-sparse, pass 2 needs this
    # key's distinct encodings (+ any chain rows); 2 = dense WITH rho-chain
    # rows — the dense partial is complete here (__partial), pass 2 only
    # replays the (astronomically rare) chain rows, NEVER the full
    # distinct-encode of a hot key
    pass1_schema = StructType(
        key_fields
        + [out_field, StructField("__defer", IntegerType(), False), StructField("__partial", BinaryType(), True)]
    )
    out_schema = StructType(key_fields + [out_field])
    vname = out_field.name

    def assemble_dense(pdf: pd.DataFrame) -> pd.DataFrame:
        key = keyrow(pdf)
        valid = pdf["__rho"].notna()
        nchain = int(np.nansum(pdf["__nchain"].to_numpy(dtype=np.float64)))
        nvalid = int(valid.sum())
        if nvalid == 0 and nchain == 0:
            # key whose every value was NULL → SQL NULL (reference contract)
            return pd.DataFrame({**key, vname: [emit(None)], "__defer": [0], "__partial": [None]})
        if nvalid > cap:
            dense = np.zeros(1 << bb, dtype=np.uint8)
            np.maximum.at(
                dense,
                pdf.loc[valid, "__idx"].to_numpy(dtype=np.float64).astype(np.int64),
                np.minimum(pdf.loc[valid, "__rho"].to_numpy(dtype=np.float64).astype(np.int64), 255).astype(np.uint8),
            )
            sk = HLL(bb, bbin, None, dense, HASH_XXHASH_SPARK)
            if nchain == 0:
                return pd.DataFrame({**key, vname: [emit(sk)], "__defer": [0], "__partial": [None]})
            return pd.DataFrame({**key, vname: [None], "__defer": [2], "__partial": [sk.to_bytes()]})
        # maybe-sparse (with or without chain rows) → pass 2 re-encodes
        return pd.DataFrame({**key, vname: [None], "__defer": [1], "__partial": [None]})

    # localCheckpoint, NOT cache(): cache is keyed on the LOGICAL PLAN, so a
    # later identical query would silently reuse this result (skipping the
    # whole scan — poisons benchmarks and surprises users), and the entry
    # is never unpersisted.  localCheckpoint materializes eagerly (the one
    # heavy reduction), is keyed on the RDD object (no cross-query reuse),
    # and its blocks are GC-cleaned when the result goes out of scope.
    # Output is tiny: one row per group key.
    # Trade-off: checkpoint blocks have no lineage fallback — on a cluster,
    # losing an executor between materialization and consumption fails the
    # query (retry re-runs it) instead of recomputing; avoid aggressive
    # dynamic-allocation downscaling mid-query, per Spark's own
    # localCheckpoint guidance.
    pass1 = regs.groupBy(*by).applyInPandas(assemble_dense, schema=pass1_schema).localCheckpoint(eager=True)
    done = pass1.filter(F.col("__defer") == 0).select(*by, vname)
    flag_sparse = pass1.filter(F.col("__defer") == 1).select(*by)
    flag_any = pass1.filter(F.col("__defer") != 0).select(*by)

    # pass1 is already materialized — the emptiness decision is free
    if flag_any.isEmpty():
        return done

    def assemble_sparse(pdf: pd.DataFrame) -> pd.DataFrame:
        key = keyrow(pdf)
        # chain hashes travel as decimal strings: a nullable int64 column
        # becomes float64 in pandas and would round hashes above 2^53
        chains = np.array([int(x) for x in pdf["__chain_h"].dropna()], dtype=np.int64)
        partial = pdf["__partial"].dropna()
        if len(partial):
            # dense partial from pass 1 — only its chain rows arrive here
            sk = HLL.from_bytes(bytes(partial.iloc[0]))
        else:
            encs = np.unique(
                pdf.loc[pdf["__enc"].notna(), "__enc"].to_numpy(dtype=np.float64).astype(np.int64).astype(np.uint32)
            )
            if len(encs) > cap:
                idxs, rhos = decode_encodes(encs, bb, bbin)
                dense = np.zeros(1 << bb, dtype=np.uint8)
                np.maximum.at(dense, idxs, rhos)
                sk = HLL(bb, bbin, None, dense, HASH_XXHASH_SPARK)
            else:
                # includes the chain-only key (no encodings at all): start
                # from the empty SPARSE state, as the python engine does
                sk = HLL(bb, bbin, encs, None, HASH_XXHASH_SPARK)
        if len(chains):
            sk.add_hashes(chains.view(np.uint64))
        return pd.DataFrame({**key, vname: [emit(sk)]})

    # flag_sparse can be any size (all keys, for high-cardinality sparse
    # grouping): no broadcast hint — AQE picks broadcast when it fits
    nulls = (F.lit(None).cast("long").alias("__enc"), F.lit(None).cast("string").alias("__chain_h"))
    enc_rows = (
        _semi_join_keys(hdf, flag_sparse, by, broadcast=False)
        .select(*by, F.col("__enc"), nulls[1], F.lit(None).cast("binary").alias("__partial"))
        .distinct()
    )
    chain_rows = _semi_join_keys(hdf_all.filter(F.col("__chain")), flag_any, by, broadcast=False).select(
        *by, nulls[0], F.col("__h").cast("string").alias("__chain_h"), F.lit(None).cast("binary").alias("__partial")
    )
    partial_rows = pass1.filter(F.col("__defer") == 2).select(*by, nulls[0], nulls[1], F.col("__partial"))
    pass2 = (
        enc_rows.unionByName(chain_rows)
        .unionByName(partial_rows)
        .groupBy(*by)
        .applyInPandas(assemble_sparse, schema=out_schema)
    )
    return done.unionByName(pass2)
