"""Checkpoint/resume equivalence: interrupted aggregation resumes and yields
byte-identical sketches to the uninterrupted run (north_rule; FIXTURES.md F3
resume fixture)."""

import pytest
from pyspark.sql import functions as F

from hllspark import agg
from hllspark.io import CheckpointedSketch, read_sketches, write_sketches
from hllspark.functions import register_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sql(spark)


@pytest.fixture(scope="module")
def pages_path():
    from hllspark.pipeline.pages import ensure_small

    return str(ensure_small("/root/repo"))


def test_checkpoint_resume_byte_identical(spark, pages_path, tmp_path):
    ck = CheckpointedSketch(
        spark, pages_path, "url", by=["lang"], checkpoint_dir=str(tmp_path / "ck"), n_epochs=4
    )
    # simulate an interrupted run: only 2 of 4 epochs complete
    ran = ck.process_pending(limit=2)
    assert len(ran) == 2
    st = ck.status()
    assert len(st["done"]) == 2 and len(st["pending"]) == 2

    # resume: run() picks up the remaining epochs
    final = {r["lang"]: bytes(r["sketch"]) for r in ck.run().collect()}
    assert ck.status()["pending"] == []

    # equivalence with the direct, uninterrupted pipeline
    pages = spark.read.parquet(pages_path)
    direct = {r["lang"]: bytes(r["sketch"]) for r in agg.sketch(pages, "url", by=["lang"]).collect()}
    assert final == direct

    # rerun is a no-op (idempotent) and still equal
    again = {r["lang"]: bytes(r["sketch"]) for r in ck.run().collect()}
    assert again == direct


def test_lineage_accounts_all_rows(spark, pages_path, tmp_path):
    ck = CheckpointedSketch(spark, pages_path, "url", checkpoint_dir=str(tmp_path / "ck2"), n_epochs=3)
    ck.run()
    lin = ck.lineage().collect()
    total = spark.read.parquet(pages_path).count()
    assert sum(r["rows_seen"] for r in lin) == total
    assert {r["epoch"] for r in lin} == {0, 1, 2}
    assert all(r["wall_ms"] > 0 for r in lin)


def test_sketch_table_roundtrip_and_reagg(spark, pages_path, tmp_path):
    """gp_persistence.sql analogue: persist per-group sketches, read back,
    re-aggregate with merge — no raw-data pass."""
    pages = spark.read.parquet(pages_path)
    per_lang = agg.sketch(pages, "url", by=["lang"])
    path = str(tmp_path / "sketches")
    write_sketches(per_lang, path)

    back = read_sketches(spark, path)
    # global re-merge from the stored rollup == direct global sketch
    remerged = bytes(agg.merge_partials(back).first()["sketch"])
    direct = bytes(agg.sketch(pages, "url").first()["sketch"])
    assert remerged == direct

    # the same via the SQL agg surface
    back.createOrReplaceTempView("lang_sketches")
    est = spark.sql(
        "SELECT hll_estimate_bigint(hll_merge_agg(sketch)) AS est FROM lang_sketches"
    ).first()["est"]
    from hllspark.pipeline.pages import expected_distinct_urls

    exact = expected_distinct_urls(100_000, 3)
    assert abs(est - exact) / exact < 3 * (1.04 / (2**14) ** 0.5)


def test_manifest_pins_epochs_and_rejects_input_drift(spark, pages_path, tmp_path):
    """Epoch chunks are striped once and pinned by a persisted manifest; if
    the input file set changes between runs, resume must fail loudly instead
    of silently striping new files into epochs already marked done."""
    import shutil
    from pathlib import Path

    inp = tmp_path / "drifting_input"
    shutil.copytree(pages_path, inp)
    ck = CheckpointedSketch(spark, str(inp), "url", checkpoint_dir=str(tmp_path / "ck3"), n_epochs=2)
    chunks_before = ck.epoch_files()
    ck.process_pending(limit=1)

    # same file set → same (manifested) chunks
    assert ck.epoch_files() == chunks_before

    # drift: a new parquet file lands in the input directory
    src = next(p for p in Path(inp).glob("*.parquet"))
    shutil.copy(src, inp / "part-late-arrival.parquet")
    with pytest.raises(ValueError, match="changed since this checkpoint was planned"):
        ck.epoch_files()
    with pytest.raises(ValueError):
        ck.run()


def test_sketch_table_partition_pruning(spark, tmp_path, pages_small_dir):
    """SketchTable (Iceberg-or-parquet shim): a filter on the partition
    column must prune partitions BEFORE the scan, and sketches must
    round-trip through the partitioned layout."""
    from hllspark.io import SketchTable, iceberg_available

    pages = spark.read.parquet(pages_small_dir)
    per_lang = agg.sketch(pages, "url", by=["lang"])
    t = SketchTable(spark, str(tmp_path / "rollup"))
    assert t.format == ("iceberg" if iceberg_available(spark) else "parquet")
    t.write(per_lang, partition_by=["lang"])

    back = t.read()
    pruned = back.filter(F.col("lang") == "en")
    assert t.scan_is_pruned(pruned, "lang"), "partition filter did not reach the scan"
    # values round-trip: merged estimate over the pruned partition is sane
    from hllspark.functions import hll_estimate
    est = pruned.select(hll_estimate("sketch").alias("e")).first()["e"]
    exact = pages.filter(F.col("lang") == "en").select("url").distinct().count()
    assert abs(est - exact) / exact < 0.03
