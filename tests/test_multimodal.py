"""Multimodal plumbing tests: schema, batching, decode/resize/frame-sample
over the deterministic fake codec; real-codec absence raises cleanly."""

import numpy as np
import pytest
from pyspark.sql import Row

from hllspark.pipeline import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    codec = mm.FakeCodec()
    rows = [
        Row(
            media_id=i,
            payload=codec.make_image(32 + i, 24, seed=i),
            meta=Row(mime="image/fake", width=32 + i, height=24, duration_ms=None, sample_rate=None),
        )
        for i in range(20)
    ]
    return spark.createDataFrame(rows, mm.media_schema()).repartition(3).cache()


def test_image_features(spark, media_df):
    feats = {r["media_id"]: r for r in mm.image_features(media_df, codec=mm.FakeCodec()).collect()}
    assert len(feats) == 20
    for i in range(20):
        r = feats[i]
        assert (r["width"], r["height"]) == (32 + i, 24)
        assert 0 <= r["mean"] <= 255 and len(r["hist"]) == 16
        assert sum(r["hist"]) == (32 + i) * 24


def test_resize_roundtrip(spark, media_df):
    small = mm.resize_images(media_df, 16, 12, codec=mm.FakeCodec())
    codec = mm.FakeCodec()
    for r in small.collect():
        img = codec.decode_image(bytes(r["payload"]))
        assert img.shape == (12, 16)


def test_audio_features(spark):
    codec = mm.FakeCodec()
    df = spark.createDataFrame(
        [Row(media_id=i, payload=codec.make_audio(16000, 16000 * 2, seed=i), meta=None) for i in range(5)],
        mm.media_schema(),
    )
    rows = mm.audio_features(df, codec=codec).collect()
    for r in rows:
        assert r["duration_ms"] == pytest.approx(2000.0)
        assert r["rms"] > 0 and 0 < r["zcr"] < 1


def test_frame_sampling(spark):
    codec = mm.FakeCodec()
    df = spark.createDataFrame(
        [Row(media_id=7, payload=codec.make_video(16, 8, 10, seed=1), meta=None)], mm.media_schema()
    )
    frames = mm.sample_frames(df, every_n=3, codec=codec).collect()
    assert [r["frame_no"] for r in frames] == [0, 3, 6, 9]
    img = codec.decode_image(bytes(frames[0]["frame"]))
    assert img.shape == (8, 16)


def test_missing_codec_raises(spark, media_df):
    with pytest.raises(NotImplementedError, match="codec"):
        mm.image_features(media_df)  # no codec in this container


def test_batch_hint():
    assert mm.media_batch_hint(1 << 20, target_mb=64) == 64
    assert mm.media_batch_hint(10, target_mb=64) > 1000
