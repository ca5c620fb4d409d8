"""Executor-count scaling: N vs 4N EXECUTORS (BASELINE.json north_rule shape).

bench.py evidences scaling with local[N] thread counts; this harness runs the
same flagship on Spark's `local-cluster[E, C, M]` mode — real separate
executor JVMs with their own heaps, task dispatch over RPC, and shuffle
through the block manager — scaling the EXECUTOR COUNT at fixed per-executor
resources (the north_rule's "N and 4N executors" criterion, as close as a
single box can get):

    lo:  local-cluster[2, 2, 3072]   (2 executors × 2 cores)
    hi:  local-cluster[8, 2, 3072]   (8 executors × 2 cores)

(2 cores per executor, not 4: see the LO/HI comment below — 8 four-core
JVMs oversubscribe this 32-core host and collapse the measurement.)

Same input (data/pages_scale), warmup + interleaved best-of-2 per size, the
bare-scan floor measured alongside; the generated report goes to
BENCH/CLUSTER_LATEST.md (BENCH/CLUSTER.md keeps the hand-curated multi-window
history — copy a new window row there after a run).
The udaf jar ships to executors via spark.jars and the python package via
addPyFile(dist/hllspark.zip) — i.e. the exact spark-submit artifact story.

Usage: python tools/bench_cluster.py  (~5-8 min; not part of the driver's
per-round bench — run manually, output committed)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# 2 cores per executor: 8 executors then carry 16 task threads + ~8 JVM
# service-thread sets, which still fits the 32-core host — at 4 cores each
# the hi size oversubscribes the box (32 task threads + 8 GC/netty sets)
# and collapses to 0.27 raw / 0.41 scan-floor (measured; see CLUSTER.md)
LO = (2, 2, 3072)
HI = (8, 2, 3072)


def make_cluster_spark(execs: int, cores: int, mem_mb: int):
    from pyspark.sql import SparkSession

    from hllspark import jvm_udaf

    builder = SparkSession.builder.master(f"local-cluster[{execs},{cores},{mem_mb}]")
    builder = jvm_udaf.configure_builder(builder)
    s = (
        builder.appName(f"hllspark-cluster-{execs}x{cores}")
        .config("spark.sql.shuffle.partitions", "256")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    # executors run their own python workers: ship the package like
    # spark-submit --py-files would
    zip_path = ROOT / "dist" / "hllspark.zip"
    sources = sorted((ROOT / "hllspark").rglob("*.py"))
    stale = not zip_path.exists() or zip_path.stat().st_mtime < max(p.stat().st_mtime for p in sources)
    if stale:  # a stale zip would ship last round's python to the executors
        sys.path.insert(0, str(ROOT / "tools"))
        from make_pyfiles import build

        build()
    s.sparkContext.addPyFile(str(zip_path))
    return s


def measure(execs: int, cores: int, mem_mb: int, pages_path: str, rows: int) -> tuple[float, float]:
    """(flagship rows/sec, scan-floor rows/sec) at one cluster size."""
    from pyspark.sql import functions as F

    from hllspark import agg

    s = make_cluster_spark(execs, cores, mem_mb)
    try:
        pages = s.read.parquet(pages_path)

        def flagship():
            agg.distinct(pages, "url", by=["lang"]).collect()
            agg.distinct(pages, "url").collect()

        def floor():
            pages.agg(F.max(F.xxhash64("url"))).collect()

        flagship()
        t0 = time.monotonic()
        flagship()
        t = time.monotonic() - t0
        floor()
        t0 = time.monotonic()
        floor()
        tf = time.monotonic() - t0
        return (2 * rows) / t, rows / tf
    finally:
        s.stop()


def main():
    from hllspark.pipeline.pages import ensure_scale

    pages_path = str(ensure_scale(ROOT))
    import pyarrow.parquet as pq

    rows = sum(pq.ParquetFile(p).metadata.num_rows for p in Path(pages_path).glob("*.parquet"))

    sizes = {LO: (0.0, 0.0), HI: (0.0, 0.0)}
    for _ in range(2):  # interleave rounds, keep best per size
        for size in (LO, HI):
            r, f = measure(*size, pages_path, rows)
            sizes[size] = (max(sizes[size][0], r), max(sizes[size][1], f))

    (rlo, flo), (rhi, fhi) = sizes[LO], sizes[HI]
    ratio = HI[0] / LO[0]
    eff = (rhi / rlo) / ratio
    floor_eff = (fhi / flo) / ratio
    vs_floor = min(1.0, eff / min(floor_eff, 1.0)) if floor_eff > 0 else 0.0

    result = {
        "metric": "flagship rows/sec scaling, N vs 4N executors (local-cluster)",
        "lo": {"executors": LO[0], "cores_each": LO[1], "rows_per_sec": round(rlo), "scan_floor": round(flo)},
        "hi": {"executors": HI[0], "cores_each": HI[1], "rows_per_sec": round(rhi), "scan_floor": round(fhi)},
        "efficiency": round(eff, 3),
        "scan_floor_efficiency": round(floor_eff, 3),
        "efficiency_vs_scan_floor": round(vs_floor, 3),
        "rows": rows,
    }

    # CLUSTER.md holds the hand-curated window history (round-4 change:
    # a fresh run must not clobber it) — the generated report lands here
    md = ROOT / "BENCH" / "CLUSTER_LATEST.md"
    md.parent.mkdir(exist_ok=True)
    md.write_text(
        "\n".join(
            [
                "# Executor-count scaling — N vs 4N executors (local-cluster mode)",
                "",
                "BASELINE.json's north_rule asks for throughput scaling ≥0.8 from N to 4N",
                "*executors*.  `local-cluster[E, C, M]` launches E real executor JVMs (own",
                "heaps, RPC task dispatch, block-manager shuffle) on this box — the closest a",
                "single-machine sandbox gets to executor-count scaling; the shared memory",
                "bus/host CPU is still one machine, which the scan-floor row bounds.",
                "",
                f"Input: pages_scale ({rows:,} rows).  Flagship = global + per-lang distinct-url",
                "(engine=jvm_udaf; jar via spark.jars, python package via addPyFile — the",
                "spark-submit --py-files/--jars artifact story, exercised for real because",
                "executor JVMs and their python workers share nothing with the driver process).",
                "Interleaved best-of-2 per size after warmup.",
                "",
                "| cluster size | flagship rows/sec | bare-scan floor rows/sec |",
                "|---|---|---|",
                f"| {LO[0]} executors × {LO[1]} cores | {rlo:,.0f} | {flo:,.0f} |",
                f"| {HI[0]} executors × {HI[1]} cores | {rhi:,.0f} | {fhi:,.0f} |",
                "",
                f"**Efficiency {LO[0]}→{HI[0]} executors: {eff:.3f} raw; scan-floor envelope "
                f"{floor_eff:.3f}; vs-floor {vs_floor:.3f}.**",
                "",
                "Config sizing matters on one host: at 4 cores/executor the hi size (8 JVMs ×",
                "4 task threads + GC/netty service threads) oversubscribes the 32-core box and",
                "collapses to 0.27 raw / 0.41 scan-floor; 2 cores/executor keeps 16 task",
                "threads and is the honest deployment shape for this host.  Window noise on",
                "this VM swings absolute rates 2-3× between runs — the vs-floor column (same",
                "window, same cluster) is the stable signal.",
                "",
                "(Generated by tools/bench_cluster.py; bench.py's BENCH/BASELINE.md carries the",
                "thread-count scaling and per-query timings.)",
                "",
            ]
        )
    )
    print(json.dumps(result))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
