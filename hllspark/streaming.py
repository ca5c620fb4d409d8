"""Structured Streaming surface: continuously-updated sketch state.

The reference's counters are updatable state without any notion of event
time (SURVEY.md §1.4), which maps to two Spark streaming patterns:

- ``sketch_stream`` (foreachBatch): each micro-batch builds partial sketches
  (the same mapInArrow phase 1 as batch mode) and merges them into a
  versioned parquet state directory.  State versions are keyed by batch_id,
  so retries are idempotent (skip if the version exists) and merge
  idempotence makes duplicate input harmless.  ``read_state`` serves the
  current estimates at any time — the streaming twin of the
  checkpoint-resumable batch path (hllspark.io).

- ``running_distinct`` (applyInPandasWithState): per-key running distinct
  estimates emitted every micro-batch, state = the serialized sketch itself
  (bounded: ≤16 KiB per key at b=14 regardless of stream length).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from . import agg
from .core.hll import HLL
from .functions import DEFAULT_B, DEFAULT_BINBITS, build_sketch


class SketchStream:
    """foreachBatch sink maintaining merged sketch state in parquet.

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
    ):
        self.state_dir = state_dir.rstrip("/")
        self.value_col = value_col
        self.by = list(by or [])
        self.b = b
        self.binbits = binbits
        self.input_type = input_type

    def _version_dir(self, batch_id: int) -> str:
        return f"{self.state_dir}/v={batch_id}"

    def _latest(self, spark: SparkSession) -> tuple[int, DataFrame | None]:
        from .io import _hadoop_fs

        fs, hpath, jvm = _hadoop_fs(spark, self.state_dir)
        if not fs.exists(hpath):
            return -1, None
        versions = []
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if name.startswith("v=") and fs.exists(jvm.org.apache.hadoop.fs.Path(f"{self.state_dir}/{name}/_SUCCESS")):
                versions.append(int(name[2:]))
        if not versions:
            return -1, None
        v = max(versions)
        return v, spark.read.parquet(self._version_dir(v))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        latest_v, state = self._latest(spark)
        if batch_id <= latest_v:
            return  # replayed batch — state already includes it (idempotent)
        partials = agg.build_partials(
            batch_df, self.value_col, self.by, b=self.b, binbits=self.binbits,
            input_type=self.input_type, lineage=False,
        )
        if state is not None:
            partials = partials.unionByName(state.select(*self.by, "sketch"))
        merged = agg.merge_partials(partials, self.by)
        merged.write.mode("overwrite").parquet(self._version_dir(batch_id))
        # prune older versions (keep last 2 for readers in flight)
        from .io import _hadoop_fs

        fs, _, jvm = _hadoop_fs(spark, self.state_dir)
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(self.state_dir)):
            name = st.getPath().getName()
            if name.startswith("v=") and int(name[2:]) < batch_id - 1:
                fs.delete(st.getPath(), True)

    def state(self, spark: SparkSession) -> DataFrame | None:
        return self._latest(spark)[1]

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
) -> DataFrame:
    """Per-key running approximate-distinct over a stream: state is the
    sketch bytes, output (key..., est, rows_seen) refreshed per micro-batch."""
    by = list(by or [])
    out_schema = StructType(
        [StructField(c, stream_df.schema[c].dataType, True) for c in by]
        + [StructField("est", DoubleType(), True), StructField("rows_seen", LongType(), True)]
    )
    state_schema = StructType(
        [StructField("sketch", BinaryType(), True), StructField("rows_seen", LongType(), True)]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, rows_seen = state.get
            h = HLL.from_bytes(bytes(blob))
        else:
            h, rows_seen = HLL.create(b=b, binbits=binbits), 0
        for pdf in pdfs:
            rows_seen += len(pdf)
            h.merge(build_sketch(pdf[value_col], b=b, binbits=binbits, input_type=input_type))
        state.update((h.to_bytes(), rows_seen))
        yield pd.DataFrame([{**dict(zip(by, key)), "est": h.estimate(), "rows_seen": rows_seen}])

    return stream_df.groupBy(*by).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
