"""Sketch-table persistence and checkpoint-resumable aggregation.

The stored-counter workflow of the reference (persist counters per group,
re-aggregate later with merge/sum — README.md:135-166, test/sql/
gp_persistence.sql:3-12) generalizes on Spark to *checkpointed epochs*
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"):

  input files → epochs (deterministic file chunks)
  per epoch:   phase-1 partial sketches + lineage written to
               <checkpoint>/partials/epoch=N (atomic via _SUCCESS)
  finalize:    read ALL epoch partials → phase-2 merge → final sketches

Resume = re-run the same call: epochs whose _SUCCESS marker exists are
skipped.  Correctness under retry/duplication is free because register-max
merge is idempotent (re-merging the same partial is a no-op).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import agg
from .functions import DEFAULT_B, DEFAULT_BINBITS


def write_sketches(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a sketch DataFrame (BinaryType round-trips natively in parquet)."""
    df.write.mode(mode).parquet(path)


def read_sketches(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff Iceberg classes are on the session's JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


class SketchTable:
    """Catalog table of sketches/rollups with graceful degradation:
    Iceberg when its runtime is on the classpath (manifest-level partition
    pruning, snapshot time travel, schema/partition evolution — what a
    100 TB deployment wants), else hive-style partitioned parquet, which
    preserves the two properties the query plans here rely on:

    - partition pruning: a filter on a partition column prunes directories
      before the scan (asserted via the physical plan in tests);
    - column pruning / filter pushdown on the non-partition columns.

    ``name_or_path``: a catalog table name for Iceberg, a directory path
    for parquet.  The API is intentionally the small shared subset.
    """

    def __init__(self, spark: SparkSession, name_or_path: str, format: str = "auto"):
        self.spark = spark
        self.target = name_or_path
        if format == "auto":
            format = "iceberg" if iceberg_available(spark) else "parquet"
        if format not in ("iceberg", "parquet"):
            raise ValueError(f"unknown format {format!r}")
        self.format = format

    def write(self, df: DataFrame, partition_by: Sequence[str] = (), mode: str = "overwrite") -> None:
        partition_by = list(partition_by)
        if self.format == "iceberg":
            w = df.writeTo(self.target).using("iceberg")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        df.write.mode(mode).partitionBy(*partition_by).parquet(self.target)

    def read(self) -> DataFrame:
        if self.format == "iceberg":
            return self.spark.read.table(self.target)
        return self.spark.read.parquet(self.target)

    def scan_is_pruned(self, df: DataFrame, partition_col: str) -> bool:
        """True iff the physical plan prunes by ``partition_col`` before the
        scan (PartitionFilters for parquet; Iceberg encodes pruning in its
        scan's filter expression)."""
        plan = df._jdf.queryExecution().executedPlan().toString()
        if self.format == "iceberg":
            return partition_col in plan and "BatchScan" in plan
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        return bool(m and partition_col in m.group(1))


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def _read_text(spark: SparkSession, path: str) -> str | None:
    fs, hpath, jvm = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        return str(jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8"))
    finally:
        stream.close()


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, hpath, _ = _hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


class CheckpointedSketch:
    """Checkpoint-resumable distinct-count aggregation over a parquet table.

    >>> ck = CheckpointedSketch(spark, "/data/pages", "url", by=["lang"],
    ...                         checkpoint_dir="/ckpt/pages_url", n_epochs=8)
    >>> ck.run()          # processes missing epochs, then merges
    >>> ck.lineage()      # per (epoch, partition) rows_seen / wall_ms / ...
    """

    def __init__(
        self,
        spark: SparkSession,
        input_path: str,
        value_col: str,
        by: Sequence[str] | None = None,
        checkpoint_dir: str = "",
        n_epochs: int = 8,
        b: int = DEFAULT_B,
        binbits: int = DEFAULT_BINBITS,
        input_type: str = "auto",
    ):
        if not checkpoint_dir:
            raise ValueError("checkpoint_dir is required")
        self.spark = spark
        self.input_path = input_path
        self.value_col = value_col
        self.by = list(by or [])
        self.checkpoint_dir = checkpoint_dir.rstrip("/")
        self.n_epochs = n_epochs
        self.b = b
        self.binbits = binbits
        self.input_type = input_type

    # -- epoch planning ------------------------------------------------------

    def epoch_files(self) -> list[list[str]]:
        """Epoch → file chunks, pinned by a persisted manifest.

        The chunking is striped over the CURRENT file listing only on first
        run; after that the manifest is authoritative.  Without it, files
        added (or removed) between runs would re-stripe into epochs already
        marked done and silently never be processed — resume must fail
        loudly on input drift instead (delete the checkpoint dir, or point
        at a fresh one, to re-plan)."""
        import json

        files = sorted(self.spark.read.parquet(self.input_path).inputFiles())
        if not files:
            raise ValueError(f"no input files under {self.input_path}")
        manifest_path = f"{self.checkpoint_dir}/manifest.json"
        raw = _read_text(self.spark, manifest_path)
        if raw is not None:
            man = json.loads(raw)
            if man["files"] != files:
                added = sorted(set(files) - set(man["files"]))
                removed = sorted(set(man["files"]) - set(files))
                raise ValueError(
                    f"input file set under {self.input_path} changed since this "
                    f"checkpoint was planned ({len(added)} added, {len(removed)} "
                    f"removed): epochs marked done would no longer cover their "
                    f"original chunks. Use a fresh checkpoint_dir (or delete "
                    f"{manifest_path} AND the partials) to re-plan."
                )
            return man["chunks"]
        n = min(self.n_epochs, len(files))
        chunks = [files[i::n] for i in range(n)]
        _write_text(self.spark, manifest_path, json.dumps({"files": files, "chunks": chunks}))
        return chunks

    def _epoch_dir(self, i: int) -> str:
        return f"{self.checkpoint_dir}/partials/epoch={i}"

    def epoch_done(self, i: int) -> bool:
        return _exists(self.spark, f"{self._epoch_dir(i)}/_SUCCESS")

    def status(self) -> dict:
        chunks = self.epoch_files()
        done = [i for i in range(len(chunks)) if self.epoch_done(i)]
        return {"n_epochs": len(chunks), "done": done, "pending": [i for i in range(len(chunks)) if i not in done]}

    # -- execution -----------------------------------------------------------

    def process_pending(self, limit: int | None = None) -> list[int]:
        """Run phase 1 for up to ``limit`` pending epochs; returns epoch ids run."""
        chunks = self.epoch_files()
        ran = []
        for i, files in enumerate(chunks):
            if self.epoch_done(i):
                continue
            df = self.spark.read.parquet(*files)
            partials = agg.build_partials(
                df, self.value_col, self.by, b=self.b, binbits=self.binbits, input_type=self.input_type, lineage=True
            ).withColumn("epoch", F.lit(i))
            partials.write.mode("overwrite").parquet(self._epoch_dir(i))
            ran.append(i)
            if limit is not None and len(ran) >= limit:
                break
        return ran

    def partials(self) -> DataFrame:
        return self.spark.read.option("basePath", f"{self.checkpoint_dir}/partials").parquet(
            f"{self.checkpoint_dir}/partials/epoch=*"
        )

    def lineage(self) -> DataFrame:
        """Per-(epoch, partition) metrics: rows_seen, nulls_skipped, wall_ms."""
        cols = ["epoch", "partition_id", "rows_seen", "nulls_skipped", "wall_ms"]
        return (
            self.partials()
            .select(*self.by, *cols)
            .dropDuplicates(["epoch", "partition_id"])
            .select(*cols)
            .orderBy("epoch", "partition_id")
        )

    def run(self) -> DataFrame:
        """Process whatever is pending, then merge all partials to final sketches."""
        pending_before = self.status()["pending"]
        if pending_before:
            self.process_pending()
        p = self.partials().select(*self.by, "sketch")
        return agg.merge_partials(p, self.by)
