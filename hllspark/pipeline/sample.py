"""Deterministic stratified sampling for training-data curation.

``stratified_sample`` draws k rows per stratum by HASH RANK: rows are
ordered by a deterministic hash of their key columns and the k smallest
per stratum win.  That makes the selection a pure function of the key SET
— independent of partitioning, row order, cluster size, or retries — so a
sample drawn at 100 TB is reproducible row-for-row, auditable with plain
SQL in any engine that shares the rank function, and stable across reruns
(the property that matters when the sample feeds an eval set).

Two physical plans, identical output:

- ``method="window"``: one window — ``row_number() OVER (PARTITION BY
  strata ORDER BY rank, keys) <= k`` — pure Catalyst.  Spark's window
  sort-shuffles every row of a stratum to one task chain; fine up to very
  large strata (sort spills), but the shuffle carries ALL rows.
- ``method="fold"`` (default): each input partition folds a running
  bottom-k per stratum across its Arrow batches (the ann.topk_cosine
  pattern), so the shuffle carries ≤ P×k candidate rows per stratum
  instead of the stratum's full row count; an exact window over that
  bounded candidate set picks the final k, and a semi-join (AQE
  broadcasts the small side) retrieves the full rows.  Hashing stays in
  the JVM (xxhash64 projected before mapInArrow); Python only SELECTS.

The reference has no sampling surface — this operator exists for the
training-data-pipeline tier (sample n docs per language/domain for evals,
human review, or distillation) where "the sample must be reproducible and
cheap at corpus scale" is the requirement.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANK = "__rank"
_RN = "__rn"


def _bottom_k_fold(strata: list[str], keys: list[str], k: int):
    """mapInArrow kernel: running bottom-k rows per stratum, folded across
    the partition's Arrow batches — emits ≤ k rows per stratum seen by this
    partition, so the candidate set is bounded by P×k per stratum."""

    def fold(batches) -> Iterator:
        import pandas as pd
        import pyarrow as pa

        buf: pd.DataFrame | None = None
        schema = None

        def prune(pdf: pd.DataFrame) -> pd.DataFrame:
            # k smallest ranks per stratum; key columns break exact-rank
            # ties so the fold is deterministic for duplicate-key inputs
            pdf = pdf.sort_values([*strata, _RANK, *keys])
            if not strata:  # global sample: one stratum
                return pdf.head(k)
            return pdf.groupby(strata, sort=False, dropna=False).head(k)

        for batch in batches:
            schema = batch.schema
            # Arrow-backed dtypes: plain to_pandas() degrades an int64
            # column WITH NULLS to float64, silently rounding the low bits
            # of large keys (the round-4 minhash landmine) — ArrowDtype
            # keeps nullable int64 lossless through sort/groupby/concat
            pdf = batch.to_pandas(types_mapper=pd.ArrowDtype)
            part = prune(pdf)
            buf = part if buf is None else prune(pd.concat([buf, part], ignore_index=True))
        if buf is not None and len(buf):
            # Table, not RecordBatch: concat'd ArrowDtype columns convert
            # to ChunkedArrays, which RecordBatch.from_pandas rejects
            tbl = pa.Table.from_pandas(buf, schema=schema, preserve_index=False)
            yield from tbl.combine_chunks().to_batches()

    return fold


def stratified_sample(
    df: DataFrame,
    by: Sequence[str],
    k: int,
    key_cols: Sequence[str],
    seed: int = 0,
    rank: Column | None = None,
    method: str = "fold",
    _candidates_out: list | None = None,
) -> DataFrame:
    """k-per-stratum deterministic sample → the sampled ROWS of ``df``.

    ``by``: stratum columns (empty = one global stratum).  ``key_cols``:
    columns hashed into the rank and used as the final tie-break — they
    must uniquely identify a row for the sample to be exactly k per
    stratum (duplicate keys tie under every deterministic order; the
    fold path's semi-join then returns every row of a chosen key).
    ``rank``: override the default ``xxhash64(*key_cols, seed)`` with any
    deterministic orderable Column — e.g. ``md5(concat_ws(':', id, lit(s)))``
    for a rank an external SQL engine can replay exactly (window method
    only: the fold kernel requires the default int64 rank).

    ``_candidates_out``: test hook — appends the fold path's candidate
    DataFrame so the ≤ P×k-per-stratum bound can be counted externally.
    """
    by, key_cols = list(by), list(key_cols)
    if k <= 0:
        raise ValueError("k must be positive")
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    missing = [c for c in (*by, *key_cols) if c not in df.columns]
    if missing:
        raise ValueError(f"input lacks columns {missing}")
    internal = [c for c in (_RANK, _RN) if c in df.columns]
    if internal:
        # the window method withColumn/drops these names — a user column
        # would be silently overwritten and removed from the output
        raise ValueError(
            f"input columns {internal} collide with stratified_sample's "
            "internal working columns; rename them first"
        )
    if rank is not None and method != "window":
        raise ValueError(
            "a custom rank is window-only: the fold kernel folds the "
            "default int64 xxhash64 rank"
        )
    rank = F.xxhash64(*key_cols, F.lit(seed)) if rank is None else rank
    order = [F.col(_RANK), *[F.col(c) for c in key_cols]]
    win = Window.partitionBy(*by).orderBy(*order)
    if method == "window":
        return (
            df.withColumn(_RANK, rank)
            .withColumn(_RN, F.row_number().over(win))
            .where(F.col(_RN) <= k)
            .drop(_RANK, _RN)
        )
    if method != "fold":
        raise ValueError(f"unknown method {method!r}; expected fold or window")
    slim = df.select(*by, *key_cols, rank.alias(_RANK))
    cand = slim.mapInArrow(_bottom_k_fold(by, key_cols, k), schema=slim.schema)
    if _candidates_out is not None:
        _candidates_out.append(cand)
    picked = (
        cand.withColumn(_RN, F.row_number().over(win))
        .where(F.col(_RN) <= k)
        .select(*[F.col(c).alias(f"__pk_{c}") for c in key_cols])
    )
    # null-safe equi-join (still a hash join): a NULL key can legitimately
    # win its stratum's draw, and `=` would silently drop it
    cond = None
    for c in key_cols:
        eq = df[c].eqNullSafe(picked[f"__pk_{c}"])
        cond = eq if cond is None else cond & eq
    return df.join(picked, on=cond, how="left_semi")
