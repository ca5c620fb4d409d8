"""Round-6 optimization-parity tests: the vectorized batch kernels must be
byte-/value-identical to the sequential object paths they replaced, and the
new input guards must refuse the ambiguous shapes loudly."""

import numpy as np
import pandas as pd
import pytest

from hllspark.core.hll import (
    HLL,
    estimate_blobs,
    merge_blobs,
)
import hllspark.core.hll as hllmod


def _mk(n, b=14, binbits=6, hk=1, compress=False, seed=0):
    h = (
        np.random.default_rng(seed).integers(0, 2**63, size=n, dtype=np.uint64)
        if n
        else np.empty(0, np.uint64)
    )
    s = HLL.create(b=b, binbits=binbits, hash_kind=hk)
    s.add_hashes(h)
    return s.to_bytes(compress=compress)


def _seq_merge(blobs):
    acc = None
    for v in blobs:
        if v is None:
            continue
        s = HLL.from_bytes(bytes(v))
        acc = s if acc is None else acc.merge(s)
    return None if acc is None else acc.to_bytes()


def test_merge_blobs_matches_sequential_fold_across_payload_forms():
    rng = np.random.default_rng(0)
    cases = [
        [None, None],
        [_mk(0)] * 3,  # empty sparse counters round-trip
        [_mk(int(rng.integers(0, 900)), seed=i) for i in range(100)],  # stays/exceeds sparse
        [_mk(300, seed=i, compress=True) for i in range(40)],  # group-varint payloads
        [_mk(5000, seed=1), _mk(100, seed=2), None, _mk(50, seed=3, compress=True)],  # dense mix
        [HLL.from_bytes(_mk(3000, seed=1)).to_bytes(compress=True), _mk(50, seed=2)],  # deflate
        [HLL.from_bytes(_mk(3000, seed=1)).to_bytes(packed=False), _mk(50, seed=2)],  # unpacked
        [_mk(100, seed=9)] * 50,  # heavy overlap stays sparse
        [_mk(80, b=8, binbits=5, hk=0, seed=i) for i in range(30)],  # non-default params
    ]
    for blobs in cases:
        m = merge_blobs(blobs)
        assert _seq_merge(blobs) == (None if m is None else m.to_bytes())


def test_merge_blobs_flush_threshold_preserves_bytes(monkeypatch):
    # the memory-bounding intermediate union (set union is associative)
    # must never change the result, whether the final state is dense...
    blobs = [_mk(int(np.random.default_rng(i).integers(1, 900)), seed=i) for i in range(120)]
    ref = merge_blobs(blobs).to_bytes()
    monkeypatch.setattr(hllmod, "_MERGE_FLUSH_ENTRIES", 1000)
    assert merge_blobs(blobs).to_bytes() == ref
    # ...or stays sparse
    small = [_mk(5, seed=i) for i in range(50)]
    monkeypatch.setattr(hllmod, "_MERGE_FLUSH_ENTRIES", 16_000_000)
    ref2 = merge_blobs(small).to_bytes()
    monkeypatch.setattr(hllmod, "_MERGE_FLUSH_ENTRIES", 20)
    assert merge_blobs(small).to_bytes() == ref2


def test_merge_blobs_flush_converts_to_dense_instead_of_requniquing(monkeypatch):
    # once the deduped accumulator exceeds sparse capacity it folds into
    # dense registers and resets — without that, pending stays above the
    # threshold forever and EVERY later blob re-unions the whole set
    # (quadratic in batch size)
    blobs = [_mk(10, seed=i) for i in range(300)]  # ~3000 distinct, cap 1020
    ref = _seq_merge(blobs)
    calls = {"n": 0}
    real_unique = np.unique

    def counting_unique(*a, **k):
        calls["n"] += 1
        return real_unique(*a, **k)

    monkeypatch.setattr(hllmod, "_MERGE_FLUSH_ENTRIES", 100)
    monkeypatch.setattr(hllmod.np, "unique", counting_unique)
    assert merge_blobs(blobs).to_bytes() == ref
    # ~1 unique per flush window (≈ total/flush ≈ 30), not one per blob
    assert calls["n"] < 100


def test_estimate_blobs_corrupt_payloads_fail_like_object_path():
    import struct as _s

    good = _mk(200, seed=5)
    trunc = good[:20]  # raw sparse truncated mid-payload
    header = good[:4] + _s.pack("<i", 1 << 28) + good[8:]  # absurd idx field
    for bad in (trunc, header):
        with pytest.raises(ValueError) as fast_err:
            estimate_blobs([bad])
        with pytest.raises(ValueError) as obj_err:
            HLL.from_bytes(bad).estimate()
        assert str(fast_err.value) == str(obj_err.value)


def test_merge_blobs_mismatch_errors_match_pairwise_merge():
    for mut, frag in [({"b": 15}, "index size"), ({"binbits": 5}, "bin size"), ({"hk": 0}, "hash kind")]:
        blobs = [_mk(10, seed=1), _mk(10, seed=2, **mut)]
        with pytest.raises(ValueError, match=frag) as vec_err:
            merge_blobs(blobs)
        with pytest.raises(ValueError) as seq_err:
            _seq_merge(blobs)
        assert str(vec_err.value) == str(seq_err.value)


def test_estimate_blobs_matches_object_path():
    rng = np.random.default_rng(1)
    blobs = [None]
    for i in range(60):
        blobs.append(_mk(int(rng.integers(0, 1100)), seed=i, compress=bool(i % 2)))
    blobs.append(_mk(4000, seed=99))  # dense fallback row
    expected = [None if v is None else HLL.from_bytes(bytes(v)).estimate() for v in blobs]
    assert estimate_blobs(blobs) == expected


# (a batched pairwise set-op kernel and its parity tests lived here briefly
# during round 6 — A/B'd and removed: wall parity at the bench shape, up to
# 4x more CPU at ~400-entry sparse pairs than the per-row object path; see
# the note above core/hll.py's estimate_blobs and OPTIMIZATION_r06.md)


def test_tdigest_update_weighted_order_canonicalization():
    # the JVM-builder fold presorts (introsort — legal on distinct values);
    # this pins WHY that is byte-safe for TDigest: update_weighted
    # canonicalizes order internally (stable argsort), so sorted and
    # unsorted input yield identical bytes — the external presort only
    # makes the internal pass adaptive/cheap, it is not load-bearing for
    # TDigest.  (KLL is different: its level buffers append in input
    # order, so for KLL the presort IS the canonical-order guarantee.)
    from hllspark.sketches.tdigest import TDigest

    rng = np.random.default_rng(3)
    v = rng.permutation(rng.uniform(-1e9, 1e9, size=5000))
    n = rng.integers(1, 50, size=5000).astype(np.float64)
    a = TDigest.create(delta=100)
    a.update_weighted(v, n)
    order = np.argsort(v, kind="stable")
    b = TDigest.create(delta=100)
    b.update_weighted(v[order], n[order])
    assert a.to_bytes() == b.to_bytes()


def test_cube_value_col_in_dims_refused(spark):
    from hllspark import agg
    from hllspark.sketches import router

    df = spark.createDataFrame([(1, "a")], "v long, d string")
    with pytest.raises(ValueError, match="cannot also be a dim"):
        agg.sketch_cube(df, "v", ["v", "d"])
    with pytest.raises(ValueError, match="cannot also be a dim"):
        router.build_cube(df, "v", "countmin", ["v", "d"])
    stored = spark.createDataFrame([("a", bytearray(b""))], "sketch string, d string")
    with pytest.raises(ValueError, match="cannot also be a dim"):
        router.merge_stored_cube(stored, "hll", ["sketch", "d"])


def test_stratified_sample_internal_column_collision_refused(spark):
    from hllspark.pipeline.sample import stratified_sample

    df = spark.createDataFrame([(1, "a", 0)], "id long, s string, __rank long")
    with pytest.raises(ValueError, match="internal working columns"):
        stratified_sample(df, ["s"], 1, ["id"], method="window")
