"""Unit tests for the sibling sketches: accuracy bounds vs exact ground
truth, merge algebra, serialization round-trips (SURVEY.md §2.8 contract)."""

import numpy as np
import pytest

from hllspark.core.hash import hash_int64
from hllspark.sketches import KLL, Bloom, CountMin, MinHash, TDigest

RNG = np.random.RandomState(42)


# ---------------------------------------------------------------- count-min


def test_countmin_point_queries_within_bound():
    # zipf-ish frequencies
    items = RNG.zipf(1.5, size=200_000).astype(np.int64)
    items = items[items < 10_000]
    cm = CountMin.create(width=4096, depth=5)
    cm.add_hashes(hash_int64(items))

    keys, exact = np.unique(items, return_counts=True)
    est = cm.query_hashes(hash_int64(keys))
    assert (est >= exact).all()  # never underestimates
    bound = cm.epsilon * len(items)
    assert (est <= exact + 3 * bound).all()
    # heavy hitters essentially exact
    top = np.argsort(-exact)[:10]
    assert np.abs(est[top] - exact[top]).max() <= bound


def test_countmin_merge_equals_single_pass():
    a_items = RNG.randint(0, 1000, 50_000).astype(np.int64)
    b_items = RNG.randint(0, 1000, 50_000).astype(np.int64)
    one = CountMin.create()
    one.add_hashes(hash_int64(np.concatenate([a_items, b_items])))
    a = CountMin.create()
    a.add_hashes(hash_int64(a_items))
    b = CountMin.create()
    b.add_hashes(hash_int64(b_items))
    merged = a.copy().merge(b)
    assert np.array_equal(merged.counts, one.counts)  # exact linearity
    assert merged.total == one.total
    back = CountMin.from_bytes(merged.to_bytes())
    assert np.array_equal(back.counts, merged.counts)
    with pytest.raises(ValueError):
        CountMin.create(width=1024).merge(CountMin.create(width=2048))


# ---------------------------------------------------------------- bloom


def test_bloom_membership_and_fp_rate():
    present = np.arange(10_000, dtype=np.int64)
    bf = Bloom.from_capacity(10_000, fp_rate=0.01)
    bf.add_hashes(hash_int64(present))
    assert bf.contains_hashes(hash_int64(present)).all()  # no false negatives
    absent = np.arange(1_000_000, 1_050_000, dtype=np.int64)
    fp = bf.contains_hashes(hash_int64(absent)).mean()
    assert fp < 0.03, fp
    # merge = OR: union membership
    bf2 = Bloom(bf.m_bits, bf.k, np.zeros_like(bf.bits))
    extra = np.arange(20_000, 30_000, dtype=np.int64)
    bf2.add_hashes(hash_int64(extra))
    u = bf.copy().merge(bf2)
    assert u.contains_hashes(hash_int64(extra)).all()
    back = Bloom.from_bytes(u.to_bytes())
    assert np.array_equal(back.bits, u.bits)


# ---------------------------------------------------------------- minhash


def test_minhash_jaccard_estimate():
    a_items = np.arange(0, 10_000, dtype=np.int64)
    b_items = np.arange(5_000, 15_000, dtype=np.int64)  # true J = 5000/15000 = 1/3
    a = MinHash.create(k=256)
    a.add_hashes(hash_int64(a_items))
    b = MinHash.create(k=256)
    b.add_hashes(hash_int64(b_items))
    j = a.jaccard(b)
    assert abs(j - 1 / 3) < 0.1  # σ = sqrt(J(1-J)/k) ≈ 0.03
    # merge = union of sets: byte-identical across orders
    u1 = a.copy().merge(b)
    u2 = b.copy().merge(a)
    assert u1.to_bytes() == u2.to_bytes()
    full = MinHash.create(k=256)
    full.add_hashes(hash_int64(np.arange(0, 15_000, dtype=np.int64)))
    assert np.array_equal(u1.sig, full.sig)  # min is exact under union
    back = MinHash.from_bytes(u1.to_bytes())
    assert np.array_equal(back.sig, u1.sig)


# ---------------------------------------------------------------- t-digest


def test_tdigest_quantiles_within_rank_error():
    vals = RNG.lognormal(0, 2, size=200_000)
    td = TDigest.create(delta=100)
    # feed in chunks like Arrow batches
    for lo in range(0, len(vals), 65536):
        td.update_values(vals[lo : lo + 65536])
    assert td.n_centroids < 300
    s = np.sort(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = td.quantile(q)
        # compare in RANK space (t-digest's guarantee)
        rank = np.searchsorted(s, est) / len(s)
        assert abs(rank - q) < 0.02, (q, rank)
    assert td.quantile(0.0) == s[0] and td.quantile(1.0) == s[-1]


def test_tdigest_merge_accuracy_and_roundtrip():
    vals = RNG.normal(100, 15, size=100_000)
    parts = np.array_split(vals, 7)
    digests = [TDigest.create() for _ in parts]
    for d, p in zip(digests, parts):
        d.update_values(p)
    merged = digests[0].copy()
    for d in digests[1:]:
        merged.merge(d)
    s = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(s, merged.quantile(q)) / len(s)
        assert abs(rank - q) < 0.02
    assert merged.total == pytest.approx(len(vals))
    back = TDigest.from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == merged.quantile(0.5)
    assert abs(merged.rank(100.0) - 0.5) < 0.02


# ---------------------------------------------------------------- kll


def test_kll_quantiles_within_rank_error():
    vals = RNG.exponential(10, size=200_000)
    k = KLL.create(k=200)
    for lo in range(0, len(vals), 65536):
        k.update_values(vals[lo : lo + 65536])
    s = np.sort(vals)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(s, k.quantile(q)) / len(s)
        assert abs(rank - q) < 0.03, (q, rank)
    # sketch stays small
    assert sum(len(b) for b in k.levels) < 3000


def test_kll_merge_and_roundtrip():
    vals = RNG.uniform(0, 1, size=120_000)
    parts = np.array_split(vals, 5)
    ks = [KLL.create() for _ in parts]
    for k_, p in zip(ks, parts):
        k_.update_values(p)
    merged = ks[0].copy()
    for k_ in ks[1:]:
        merged.merge(k_)
    assert merged.total == len(vals)
    s = np.sort(vals)
    for q in (0.25, 0.5, 0.75):
        rank = np.searchsorted(s, merged.quantile(q)) / len(s)
        assert abs(rank - q) < 0.03
    back = KLL.from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == merged.quantile(0.5)
    assert abs(back.rank(0.5) - 0.5) < 0.03
    with pytest.raises(ValueError):
        KLL.create(k=200).merge(KLL.create(k=100))
