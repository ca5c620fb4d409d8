"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` columns + a typed metadata struct
(mime/width/height/duration_ms/sample_rate), the layout used by web-scale
crawl tables.  The Spark side — schema, partition sizing, Arrow batch shape,
UDF signatures — is real and tested; the *codec* itself is pluggable:

- the real decoders (Pillow / libsndfile / pyav) are NOT in this container,
  so ``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
  given a codec;
- a deterministic FAKE codec (``FakeCodec``) implements the same interface
  over a tiny self-describing payload format, so resize / feature-extract /
  frame-sample logic is exercised end-to-end in tests and stays honest about
  batch shapes and memory (media bytes are the dominant batch weight —
  ``media_batch_hint`` computes maxRecordsPerBatch from a target batch MB).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)


def media_schema(id_type="long") -> StructType:
    return StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("meta", MEDIA_META, True),
        ]
    )


def media_batch_hint(avg_payload_bytes: int, target_mb: int = 64) -> int:
    """maxRecordsPerBatch so one Arrow batch of media ≈ target_mb."""
    return max(16, (target_mb << 20) // max(avg_payload_bytes, 1))


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


class FakeCodec:
    """Deterministic stand-in codec over a self-describing payload:

    image: b'FIMG' + <u16 w> + <u16 h> + w*h grayscale bytes
    audio: b'FAUD' + <u32 rate> + <u32 n> + n int16 LE samples
    video: b'FVID' + <u16 w> + <u16 h> + <u16 nframes> + frames of w*h bytes
    """

    @staticmethod
    def make_image(w: int, h: int, seed: int) -> bytes:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        return b"FIMG" + struct.pack("<HH", w, h) + rng.randint(0, 256, w * h, dtype=np.int64).astype(np.uint8).tobytes()

    @staticmethod
    def make_audio(rate: int, n: int, seed: int) -> bytes:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        return b"FAUD" + struct.pack("<II", rate, n) + (rng.randn(n) * 3000).astype("<i2").tobytes()

    @staticmethod
    def make_video(w: int, h: int, nframes: int, seed: int) -> bytes:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        return (
            b"FVID"
            + struct.pack("<HHH", w, h, nframes)
            + rng.randint(0, 256, w * h * nframes, dtype=np.int64).astype(np.uint8).tobytes()
        )

    def decode_image(self, payload: bytes) -> np.ndarray:
        if payload[:4] != b"FIMG":
            raise ValueError("not a FIMG payload")
        w, h = struct.unpack_from("<HH", payload, 4)
        return np.frombuffer(payload, np.uint8, count=w * h, offset=8).reshape(h, w)

    def decode_audio(self, payload: bytes) -> tuple[int, np.ndarray]:
        if payload[:4] != b"FAUD":
            raise ValueError("not a FAUD payload")
        rate, n = struct.unpack_from("<II", payload, 4)
        return rate, np.frombuffer(payload, "<i2", count=n, offset=12)

    def decode_video(self, payload: bytes) -> np.ndarray:
        if payload[:4] != b"FVID":
            raise ValueError("not a FVID payload")
        w, h, nf = struct.unpack_from("<HHH", payload, 4)
        return np.frombuffer(payload, np.uint8, count=w * h * nf, offset=10).reshape(nf, h, w)


def _require_codec(codec, kind: str):
    if codec is None:
        raise NotImplementedError(
            f"no {kind} codec available in this environment — pass codec=FakeCodec() "
            "for the deterministic test codec, or a Pillow/libsndfile/pyav adapter in production"
        )
    return codec


# ---------------------------------------------------------------------------
# operators (mapInPandas: media bytes → features / transformed media)
# ---------------------------------------------------------------------------


def image_features(df: DataFrame, payload_col: str = "payload", codec=None) -> DataFrame:
    """Decode + extract basic stats per image: width/height/mean/std + a
    16-bin intensity histogram.  Arrow-batched; one decode per row (media
    decode is inherently per-item), numpy for the math."""
    codec = _require_codec(codec, "image")

    def gen(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for payload in pdf[payload_col]:
                if payload is None:
                    rows.append((None, None, None, None, None))
                    continue
                img = codec.decode_image(bytes(payload))
                hist = np.histogram(img, bins=16, range=(0, 256))[0]
                rows.append((img.shape[1], img.shape[0], float(img.mean()), float(img.std()), hist.tolist()))
            out = pd.DataFrame(rows, columns=["width", "height", "mean", "std", "hist"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(
        gen, schema="media_id long, width int, height int, mean double, std double, hist array<bigint>"
    )


def resize_images(df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload", codec=None) -> DataFrame:
    """Nearest-neighbor resize, re-encoded with the same codec format."""
    codec = _require_codec(codec, "image")

    def gen(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = []
            for payload in pdf[payload_col]:
                if payload is None:
                    payloads.append(None)
                    continue
                img = codec.decode_image(bytes(payload))
                yi = (np.arange(out_h) * img.shape[0] // out_h).astype(np.int64)
                xi = (np.arange(out_w) * img.shape[1] // out_w).astype(np.int64)
                small = img[yi][:, xi]
                payloads.append(b"FIMG" + struct.pack("<HH", out_w, out_h) + small.tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return df.mapInPandas(gen, schema="media_id long, payload binary")


def audio_features(df: DataFrame, payload_col: str = "payload", codec=None) -> DataFrame:
    """Per-clip stats: duration, rms, zero-crossing rate."""
    codec = _require_codec(codec, "audio")

    def gen(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for payload in pdf[payload_col]:
                if payload is None:
                    rows.append((None, None, None))
                    continue
                rate, samples = codec.decode_audio(bytes(payload))
                x = samples.astype(np.float64)
                rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
                zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
                rows.append((len(x) * 1000.0 / rate, rms, zcr))
            out = pd.DataFrame(rows, columns=["duration_ms", "rms", "zcr"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(gen, schema="media_id long, duration_ms double, rms double, zcr double")


def sample_frames(df: DataFrame, every_n: int = 2, payload_col: str = "payload", codec=None) -> DataFrame:
    """Video → exploded sampled frames (media_id, frame_no, frame FIMG bytes)."""
    codec = _require_codec(codec, "video")

    def gen(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            mids, fnos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                vid = codec.decode_video(bytes(payload))
                for fno in range(0, vid.shape[0], every_n):
                    mids.append(mid)
                    fnos.append(fno)
                    frames.append(
                        b"FIMG" + struct.pack("<HH", vid.shape[2], vid.shape[1]) + vid[fno].tobytes()
                    )
            yield pd.DataFrame({"media_id": mids, "frame_no": fnos, "frame": frames})

    return df.mapInPandas(gen, schema="media_id long, frame_no int, frame binary")
