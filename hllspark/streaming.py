"""Structured Streaming surface: continuously-updated sketch state.

The reference's counters are updatable state without any notion of event
time (SURVEY.md §1.4), which maps to two Spark streaming patterns:

- ``SketchStream`` (foreachBatch): each micro-batch builds partial sketches
  (the same mapInArrow phase 1 as batch mode) and writes them as a per-batch
  DELTA holding only that batch's TOUCHED keys — per-batch write cost is
  O(touched keys), not O(all keys ever seen) (the round-3 verdict's
  write-amplification fix: the old design rewrote the entire merged state
  every micro-batch, quadratic over the stream's life at high key
  cardinality).  Every ``compact_every`` batches the deltas are folded with
  the previous compact into a new full state and dropped.  Deltas are keyed
  by batch_id, so retries are idempotent (skip if the delta — or a compact
  covering it — exists) and merge idempotence makes duplicate input
  harmless.  ``state``/``estimates`` serve the current merged view at any
  time (lazy merge of compact + live deltas) — the streaming twin of the
  checkpoint-resumable batch path (hllspark.io).

- ``running_distinct`` (applyInPandasWithState): per-key running distinct
  estimates emitted every micro-batch, state = the serialized sketch itself
  (bounded: ≤16 KiB per key at b=14 regardless of stream length).  Optional
  ``ttl_ms`` evicts idle keys (ProcessingTimeTimeout) so the state TABLE is
  bounded too over unbounded key domains.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from . import agg
from .core.hll import HLL
from .functions import DEFAULT_B, DEFAULT_BINBITS, build_sketch


class SketchStream:
    """foreachBatch sink maintaining merged sketch state in parquet,
    incrementally: per-batch DELTAS (touched keys only) + periodic
    compaction (see module doc — per-batch write cost is O(touched keys)).

    Layout: ``{state_dir}/delta/v={batch_id}`` per-batch merged partials;
    ``{state_dir}/compact/v={batch_id}`` full states, rewritten every
    ``compact_every`` batches and whenever a reader wants a compact view.

    >>> ss = SketchStream("/state/url_by_lang", "url", by=["lang"])
    >>> q = (stream.writeStream.foreachBatch(ss)
    ...        .option("checkpointLocation", "/ckpt").start())
    >>> ss.estimates(spark).show()     # queryable while the stream runs
    """

    def __init__(
        self,
        state_dir: str,
        value_col: str,
        by: Sequence[str] | None = None,
        b: int = DEFAULT_B,
        binbits: int = DEFAULT_BINBITS,
        input_type: str = "auto",
        compact_every: int = 8,
    ):
        self.state_dir = state_dir.rstrip("/")
        self.value_col = value_col
        self.by = list(by or [])
        self.b = b
        self.binbits = binbits
        self.input_type = input_type
        self.compact_every = max(1, compact_every)

    def _delta_dir(self, batch_id: int) -> str:
        return f"{self.state_dir}/delta/v={batch_id}"

    def _compact_dir(self, batch_id: int) -> str:
        return f"{self.state_dir}/compact/v={batch_id}"

    def _versions(self, spark: SparkSession, sub: str) -> list[int]:
        """Committed (_SUCCESS-marked) version ids under state_dir/sub."""
        from .io import _hadoop_fs

        root = f"{self.state_dir}/{sub}"
        fs, hpath, jvm = _hadoop_fs(spark, root)
        if not fs.exists(hpath):
            return []
        out = []
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if name.startswith("v=") and fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/{name}/_SUCCESS")):
                out.append(int(name[2:]))
        return sorted(out)

    def _ids(self, spark: SparkSession) -> tuple[int, list[int]]:
        """(latest compact id or -1, live delta ids) — file listings only, no
        parquet reads (the per-batch hot path needs just these)."""
        compacts = self._versions(spark, "compact")
        cv = compacts[-1] if compacts else -1
        return cv, [d for d in self._versions(spark, "delta") if d > cv]

    def _view(self, spark: SparkSession) -> tuple[int, list[int], DataFrame | None]:
        """(latest compact id or -1, live delta ids, lazy merged state)."""
        cv, deltas = self._ids(spark)
        parts = []
        if cv >= 0:
            parts.append(spark.read.parquet(self._compact_dir(cv)))
        parts += [spark.read.parquet(self._delta_dir(d)) for d in deltas]
        if not parts:
            return cv, deltas, None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        merged = agg.merge_partials(df.select(*self.by, "sketch"), self.by) if len(parts) > 1 else parts[0]
        return cv, deltas, merged

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cv, deltas = self._ids(spark)
        if batch_id <= cv or batch_id in deltas:
            return  # replayed batch — state already includes it (idempotent)
        partials = agg.build_partials(
            batch_df, self.value_col, self.by, b=self.b, binbits=self.binbits,
            input_type=self.input_type, lineage=False,
        )
        # one row per key TOUCHED BY THIS BATCH — the whole prior state is
        # neither read nor rewritten on the hot path
        agg.merge_partials(partials, self.by).write.mode("overwrite").parquet(self._delta_dir(batch_id))
        if len(deltas) + 1 >= self.compact_every:
            self._compact(spark, batch_id)

    def _compact(self, spark: SparkSession, batch_id: int) -> None:
        """Fold the previous compact + all live deltas into compact/v=batch_id.

        Deletion is DEFERRED one compaction cycle for readers in flight: a
        lazy state() plan built just before this compact still references
        the folded delta directories, so only deltas already covered by the
        PREVIOUS compact (and compacts older than the last two) are removed
        now — the just-folded deltas go when the NEXT compaction lands, by
        which time any reader of the old view is a full cycle stale (the
        same grace the pre-round-4 design gave its keep-last-2 versions)."""
        from .io import _hadoop_fs

        cv_prev, _, merged = self._view(spark)
        if merged is None:
            return
        merged.write.mode("overwrite").parquet(self._compact_dir(batch_id))
        fs, _, jvm = _hadoop_fs(spark, self.state_dir)
        for d in self._versions(spark, "delta"):
            if d <= cv_prev:
                fs.delete(jvm.org.apache.hadoop.fs.Path(self._delta_dir(d)), True)
        for c in self._versions(spark, "compact")[:-2]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(self._compact_dir(c)), True)

    def state(self, spark: SparkSession) -> DataFrame | None:
        """Current merged state (lazy union-merge of compact + live deltas)."""
        return self._view(spark)[2]

    def estimates(self, spark: SparkSession) -> DataFrame | None:
        from .functions import hll_estimate

        st = self.state(spark)
        if st is None:
            return None
        return st.select(*self.by, hll_estimate(F.col("sketch")).alias("est"))


def running_distinct(
    stream_df: DataFrame,
    value_col: str,
    by: Sequence[str],
    b: int = DEFAULT_B,
    binbits: int = DEFAULT_BINBITS,
    input_type: str = "auto",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running approximate-distinct over a stream: state is the
    sketch bytes, output (key..., est, rows_seen) refreshed per micro-batch.

    ``ttl_ms`` (round-4 verdict item #3): without it the state store grows
    forever over an unbounded key domain (urls/users never expire under
    ``NoTimeout``).  With ``ttl_ms`` set, a key idle for that many ms of
    processing time is EVICTED at the next micro-batch: its final estimate
    is emitted once more with ``expired=true`` (the extra boolean column
    exists only in TTL mode, so the default output schema is unchanged) and
    its state is removed — a later arrival of the same key starts a fresh
    sketch.  Use the durable SketchStream delta/compact path when evicted
    keys must remain mergeable."""
    by = list(by or [])
    extra = [] if ttl_ms is None else [StructField("expired", BooleanType(), False)]
    out_schema = StructType(
        [StructField(c, stream_df.schema[c].dataType, True) for c in by]
        + [StructField("est", DoubleType(), True), StructField("rows_seen", LongType(), True)]
        + extra
    )
    state_schema = StructType(
        [StructField("sketch", BinaryType(), True), StructField("rows_seen", LongType(), True)]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # idle-key eviction: emit the final estimate, drop the state
            if state.exists:
                blob, rows_seen = state.get
                h = HLL.from_bytes(bytes(blob))
                state.remove()
                yield pd.DataFrame(
                    [{**dict(zip(by, key)), "est": h.estimate(), "rows_seen": rows_seen, "expired": True}]
                )
            else:
                state.remove()
            return
        if state.exists:
            blob, rows_seen = state.get
            h = HLL.from_bytes(bytes(blob))
        else:
            h, rows_seen = HLL.create(b=b, binbits=binbits), 0
        for pdf in pdfs:
            rows_seen += len(pdf)
            h.merge(build_sketch(pdf[value_col], b=b, binbits=binbits, input_type=input_type))
        state.update((h.to_bytes(), rows_seen))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        row = {**dict(zip(by, key)), "est": h.estimate(), "rows_seen": rows_seen}
        if ttl_ms is not None:
            row["expired"] = False
        yield pd.DataFrame([row])

    timeout = GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    return stream_df.groupBy(*by).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )
