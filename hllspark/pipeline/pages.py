"""Deterministic Common-Crawl-style pages table generator (FIXTURES.md F3).

Schema fixed by BASELINE.json input_hint:
  url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Everything derives from ``doc_id = row_id // dup_factor`` through a splitmix64
mixer, so exact distinct counts are known by construction:
  distinct urls = ceil(n_rows / dup_factor); per-lang counts recoverable
  exactly by replaying the lang assignment.  ``text`` is derived
  deterministically from ``html`` (tag-strip invariant: byte-identical text
  per url).  ``lang`` is skewed (en ≈ 55%) to drive skew-handling tests.

Fully vectorized (numpy + pyarrow); writes parquet in row-group chunks.
No external data; seed folded into the mixer constants.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# skewed lang thresholds out of 100 (FIXTURES.md F3)
LANGS = [("en", 55), ("zh", 15), ("es", 10), ("de", 8), ("fr", 6), ("ru", 4), ("ja", 2)]
EPOCH_US = np.int64(1735689600) * 1_000_000  # 2025-01-01T00:00:00Z

_VOCAB = np.array(
    [f"w{i:03d}" for i in range(900)]
    + "the of and to in page data web site crawl text lang index query spark distinct sketch merge url html body title doc corpus token shard batch".split(),
    dtype=object,
)


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — deterministic uniform mixer."""
    z = x.astype(np.uint64) + np.uint64((0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hex16(vals: np.ndarray) -> pa.Array:
    """uint64 → 16-char lowercase hex, vectorized via the bytes roundtrip."""
    h = vals.astype(">u8").tobytes().hex()
    return pa.array(np.frombuffer(h.encode(), dtype="S16").astype("U16"))


def _chunk(row_lo: int, row_hi: int, dup_factor: int) -> pa.RecordBatch:
    rows = np.arange(row_lo, row_hi, dtype=np.uint64)
    doc = rows // np.uint64(dup_factor)

    # url: zipf-ish site id (cubed uniform → hot head) + doc-unique path
    u = _mix64(doc, 0).astype(np.float64) / 2.0**64
    site = np.floor((u**3) * 50000).astype(np.int64)
    site_str = pa.array(np.char.zfill(site.astype("U5"), 5))
    path = _hex16(_mix64(doc, 1))
    url = pc.binary_join_element_wise(
        pa.array(["https://site"] * len(rows)), site_str, pa.array([".example/"] * len(rows)), path, ""
    )

    # body: 8..24 tokens from the vocab, keyed by doc_id
    ntok = (8 + (_mix64(doc, 2) % np.uint64(17))).astype(np.int64)
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(ntok, out=offsets[1:])
    total = int(offsets[-1])
    tok_doc = np.repeat(doc, ntok)
    tok_j = (np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1], ntok).astype(np.uint64))
    tok_ids = (_mix64(tok_doc ^ (tok_j << np.uint64(40)), 3) % np.uint64(len(_VOCAB))).astype(np.int64)
    flat_tokens = pa.array(_VOCAB[tok_ids])
    body = pc.binary_join(pa.ListArray.from_arrays(pa.array(offsets), flat_tokens), " ")

    title = pc.binary_join_element_wise(pa.array(["doc "] * len(rows)), pa.array(doc.astype("U20")), "")
    text = pc.binary_join_element_wise(title, body, "\n")
    html = pc.binary_join_element_wise(
        pa.array(["<html><head><title>"] * len(rows)),
        title,
        pa.array(["</title></head><body>"] * len(rows)),
        body,
        pa.array(["</body></html>"] * len(rows)),
        "",
    ).cast(pa.binary())

    lang_code = (_mix64(doc, 4) % np.uint64(100)).astype(np.int64)
    conds = []
    lo = 0
    labels = []
    for name, width in LANGS:
        conds.append((lang_code >= lo) & (lang_code < lo + width))
        labels.append(name)
        lo += width
    lang = pa.array(np.select(conds, labels, default="en"))

    ts = (EPOCH_US + (rows % np.uint64(86400)).astype(np.int64) * 1_000_000).view("datetime64[us]")

    return pa.RecordBatch.from_arrays(
        [url.cast(pa.string()), pa.array(ts, type=pa.timestamp("us")), html, text.cast(pa.string()), lang],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def expected_distinct_urls(n_rows: int, dup_factor: int) -> int:
    return (n_rows + dup_factor - 1) // dup_factor


def lang_of_docs(n_docs: int) -> np.ndarray:
    """Replay the lang assignment for doc ids 0..n_docs-1 (ground truth)."""
    doc = np.arange(n_docs, dtype=np.uint64)
    lang_code = (_mix64(doc, 4) % np.uint64(100)).astype(np.int64)
    out = np.empty(n_docs, dtype="U2")
    lo = 0
    for name, width in LANGS:
        out[(lang_code >= lo) & (lang_code < lo + width)] = name
        lo += width
    return out


def generate(
    out_dir: str | Path,
    n_rows: int,
    dup_factor: int = 3,
    n_files: int = 8,
    chunk_rows: int = 250_000,
    force: bool = False,
) -> Path:
    """Write the pages table as a multi-file parquet dir (mirrors a sharded
    crawl dump; multiple files also give the checkpoint layer real epochs).
    Cached by (n_rows, dup_factor, n_files); returns the directory."""
    out_dir = Path(out_dir)
    marker = out_dir / f"_GENERATED_{n_rows}_{dup_factor}_{n_files}"
    if marker.exists() and not force:
        return out_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    for old in out_dir.glob("*.parquet"):
        old.unlink()
    schema = _chunk(0, 1, dup_factor).schema
    per_file = -(-n_rows // n_files)
    for i in range(n_files):
        lo_f, hi_f = i * per_file, min((i + 1) * per_file, n_rows)
        if lo_f >= hi_f:
            break
        with pq.ParquetWriter(out_dir / f"part-{i:05d}.parquet", schema, compression="zstd") as w:
            for lo in range(lo_f, hi_f, chunk_rows):
                w.write_batch(_chunk(lo, min(lo + chunk_rows, hi_f), dup_factor))
    for old in out_dir.glob("_GENERATED_*"):
        old.unlink()
    marker.touch()
    return out_dir


DEFAULT_SMALL = ("data/pages_small", 100_000, 3)
# 32M rows: big enough that the flagship at local[32] runs well clear of the
# ~0.1-1s/job scheduling floor (the round-1 16M table finished in ~1s after
# the JVM-engine rework, drowning the 8→32 scaling signal in fixed costs)
DEFAULT_BENCH = ("data/pages_bench", 32_000_000, 3)


def ensure_small(repo_root: str | Path = ".") -> Path:
    d, n, k = DEFAULT_SMALL
    return generate(Path(repo_root) / d, n, k, n_files=8)


def ensure_bench(repo_root: str | Path = ".") -> Path:
    d, n, k = DEFAULT_BENCH
    n = int(os.environ.get("SPARK_GRAFT_PAGES_ROWS", n))
    return generate(Path(repo_root) / d, n, k, n_files=16)


# scaling-only table: sized so the flagship is genuinely data-bound at both
# parallelism levels.  128M rows was calibrated while reps were accidentally
# re-reading a plan-keyed cache (~free); with honest per-rep execution a
# 64M-row pass is already 10s+ of real work at local[8] — and local[2]
# rounds at 128M made the whole bench run ~1h, past any per-round budget
DEFAULT_SCALE = ("data/pages_scale", 64_000_000, 3)


def ensure_scale(repo_root: str | Path = ".") -> Path:
    d, n, k = DEFAULT_SCALE
    n = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", n))
    return generate(Path(repo_root) / d, n, k, n_files=32)


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
    print(ensure_small(root))
    print(ensure_bench(root))
