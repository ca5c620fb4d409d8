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


def test_running_distinct_ttl_evicts_idle_keys(spark, tmp_path):
    """Round-5 fix: with ttl_ms set, a key idle past the TTL is evicted at
    the next micro-batch — its final estimate is emitted with expired=true,
    its state is removed, and a later arrival starts a fresh sketch (so the
    state table stays bounded over an unbounded key domain)."""
    import time

    src = str(tmp_path / "ttl_src")
    ckpt = str(tmp_path / "ttl_ckpt")
    sunk: list = []  # foreachBatch sink: memory sink can't restart from ckpt

    def run_batch(rows):
        mark = len(sunk)
        spark.createDataFrame(rows, "k string, v long").write.mode("append").parquet(src)
        stream = spark.readStream.schema("k string, v long").parquet(src)
        out = running_distinct(stream, "v", by=["k"], ttl_ms=1000)
        q = (
            out.writeStream.foreachBatch(lambda bdf, bid: sunk.extend(bdf.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sunk[mark:]  # only THIS run's emissions

    r1 = run_batch([("a", 1), ("a", 2), ("a", 3)])
    time.sleep(2.5)  # key "a" idles past the 1s TTL
    r2 = run_batch([("b", 10)])
    # "a" expires exactly ONCE — in run 1's trailing micro-batch or in run 2
    # (micro-batches here take >1s, so trailing-batch expiry is legitimate);
    # the eviction row carries the final estimate and rows_seen
    expired = [r for r in r1 + r2 if r["k"] == "a" and r["expired"]]
    assert len(expired) == 1
    assert expired[0]["rows_seen"] == 3
    # "b" was updated live in run 2 (it may ALSO expire in a trailing batch)
    assert any(not r["expired"] for r in r2 if r["k"] == "b")

    time.sleep(2.5)
    rows = run_batch([("a", 99)])  # "a" returns after eviction: fresh state
    fresh = [r for r in rows if r["k"] == "a" and not r["expired"]]
    assert fresh and max(r["rows_seen"] for r in fresh) == 1

    # default (no ttl) schema is unchanged — no expired column
    stream = spark.readStream.schema("k string, v long").parquet(src)
    assert "expired" not in running_distinct(stream, "v", by=["k"]).columns


def test_sketch_stream_incremental_deltas(spark, tmp_path):
    """Round-4 verdict item #3: per-batch written rows must track the batch's
    TOUCHED keys, not the full accumulated key set, and compaction must fold
    deltas without changing the merged state."""
    sd = str(tmp_path / "state_inc")
    ss = SketchStream(sd, "v", by=["k"], compact_every=3)

    def batch(rows):
        return spark.createDataFrame(rows, "k string, v long")

    ss(batch([("a", 1), ("a", 2)]), 0)
    ss(batch([("b", 3)]), 1)
    # two deltas, no compact yet; each delta holds only its touched keys
    d0 = spark.read.parquet(f"{sd}/delta/v=0")
    d1 = spark.read.parquet(f"{sd}/delta/v=1")
    assert [r["k"] for r in d0.collect()] == ["a"]
    assert [r["k"] for r in d1.collect()] == ["b"]

    before = {r["k"]: bytes(r["sketch"]) for r in ss.state(spark).collect()}
    ss(batch([("a", 9)]), 2)  # third delta triggers compaction
    # folded deltas survive ONE compaction cycle for readers in flight
    # (deferred deletion); they are no longer part of the live view
    assert ss._versions(spark, "compact") == [2]
    assert ss._ids(spark) == (2, [])
    assert ss._versions(spark, "delta") == [0, 1, 2]

    # 1000-key prior state, then a batch touching ONE key: the new delta is
    # one row (the old design rewrote all 1001 keys every batch)
    many = batch([(f"k{i}", i) for i in range(1000)])
    ss(many, 3)
    assert spark.read.parquet(f"{sd}/delta/v=3").count() == 1000
    ss(batch([("a", 10)]), 4)
    assert spark.read.parquet(f"{sd}/delta/v=4").count() == 1
    ss(batch([("b", 11)]), 5)  # second compaction: NOW the cycle-old deltas go
    assert ss._versions(spark, "compact") == [2, 5]
    assert all(d > 2 for d in ss._versions(spark, "delta"))

    # merged view = batch-built sketches over the full concatenation
    from hllspark import agg

    allrows = batch(
        [("a", 1), ("a", 2), ("b", 3), ("a", 9)]
        + [(f"k{i}", i) for i in range(1000)]
        + [("a", 10), ("b", 11)]
    )
    direct = {
        r["k"]: bytes(r["sketch"])
        for r in agg.sketch(allrows, "v", by=["k"], engine="python").collect()
    }
    got = {r["k"]: bytes(r["sketch"]) for r in ss.state(spark).collect()}
    assert got == direct
