"""Streaming sketch state: file-source micro-batches → merged sketch state
equals the batch answer; running per-key estimates via applyInPandasWithState."""

import math

import pytest
from pyspark.sql import functions as F

from hllspark import agg
from hllspark.streaming import SketchStream, running_distinct

BOUND = 3 * 1.04 / math.sqrt(2**14)


@pytest.fixture()
def staged_events(spark, sf001_dir, tmp_path):
    """events split into 3 files in a streaming source dir."""
    src = str(tmp_path / "src")
    e = spark.read.parquet(f"{sf001_dir}/events.parquet")
    e.repartition(3).write.parquet(src)
    return src, e


def test_sketch_stream_matches_batch(spark, staged_events, tmp_path):
    src, e = staged_events
    ss = SketchStream(str(tmp_path / "state"), "user_id", by=["event_type"])
    stream = spark.readStream.schema(e.schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        stream.writeStream.foreachBatch(ss)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["event_type"]: bytes(r["sketch"]) for r in ss.state(spark).collect()}
    # streaming state is built by the python-engine builder → compare same engine
    direct = {
        r["event_type"]: bytes(r["sketch"])
        for r in agg.sketch(e, "user_id", by=["event_type"], engine="python").collect()
    }
    assert got == direct  # byte-identical to the batch pipeline

    ests = {r["event_type"]: r["est"] for r in ss.estimates(spark).collect()}
    exact = {r["event_type"]: r["d"] for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()}
    for k, v in exact.items():
        assert abs(ests[k] - v) / v < BOUND


def test_sketch_stream_idempotent_replay(spark, staged_events, tmp_path):
    src, e = staged_events
    ss = SketchStream(str(tmp_path / "state2"), "user_id")
    batch = spark.read.parquet(src)
    ss(batch, 0)
    before = bytes(ss.state(spark).first()["sketch"])
    ss(batch, 0)  # replayed batch id → no-op
    assert bytes(ss.state(spark).first()["sketch"]) == before


def test_running_distinct_stateful(spark, staged_events, tmp_path):
    src, e = staged_events
    stream = spark.readStream.schema(e.schema).option("maxFilesPerTrigger", "1").parquet(src)
    out = running_distinct(stream, "user_id", by=["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("running_d")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per key = final state after all 3 micro-batches
    final = (
        spark.table("running_d")
        .groupBy("event_type")
        .agg(F.max("rows_seen").alias("rows_seen"), F.max_by("est", "rows_seen").alias("est"))
        .collect()
    )
    exact = {r["event_type"]: r["d"] for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()}
    rows_exact = {r["event_type"]: r["c"] for r in e.groupBy("event_type").count().withColumnRenamed("count", "c").collect()}
    assert len(final) == len(exact)
    for r in final:
        k = r["event_type"]
        assert r["rows_seen"] == rows_exact[k]
        assert abs(r["est"] - exact[k]) / exact[k] < BOUND
