"""Sparse group-varint compression (hll_compress_sparse parity,
hyperloglog.c:1080-1115): size goldens from test/sql/compression.ref,
roundtrip exactness, merge determinism across compressed/uncompressed forms,
and the keep-only-if-smaller fallback."""

import numpy as np
import pytest

from hllspark.core.hash import hash_int32
from hllspark.core.hll import HLL, compress_sparse, decompress_sparse

# compression.ref totals include the reference's 16-byte header; our header
# is 8 bytes, so payloads must match (ref_total - 16) EXACTLY: same codec.
REF_TOTALS = {1: 20, 100: 330, 500: 1450, 1000: 2643, 1020: 2689}


@pytest.mark.parametrize("n", sorted(REF_TOTALS))
def test_size_parity_with_reference(n):
    h = HLL.create()
    h.add_hashes(hash_int32(np.arange(1, n + 1, dtype=np.int32)))
    payload = len(compress_sparse(h.sparse))
    assert payload == REF_TOTALS[n] - 16
    blob = h.to_bytes(compress=True)
    assert len(blob) == 8 + payload
    assert HLL.from_bytes(blob).equals(h)


def test_roundtrip_random_sets():
    rng = np.random.RandomState(7)
    for n in (0, 1, 2, 3, 4, 5, 7, 63, 100, 1020):
        enc = np.unique(rng.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32))
        out = decompress_sparse(compress_sparse(enc), len(enc))
        assert np.array_equal(out, enc)


def test_compressed_merge_determinism():
    """Merging from compressed partials must yield byte-identical final
    sketches to the uncompressed path (register-max determinism)."""
    rng = np.random.RandomState(42)
    vals = rng.randint(-(2**31), 2**31, size=900, dtype=np.int64).astype(np.int32)
    a, b_ = HLL.create(), HLL.create()
    a.add_hashes(hash_int32(vals[:500]))
    b_.add_hashes(hash_int32(vals[500:]))
    plain = HLL.from_bytes(a.to_bytes()).merge(HLL.from_bytes(b_.to_bytes())).to_bytes()
    comp = HLL.from_bytes(a.to_bytes(compress=True)).merge(
        HLL.from_bytes(b_.to_bytes(compress=True))
    ).to_bytes()
    assert plain == comp


def test_incompressible_falls_back_to_raw():
    # adversarial deltas ≥ 2^24 need 4 data bytes + tag overhead > raw 4 B
    enc = (np.arange(1, 200, dtype=np.uint64) * (2**24 + 7)).astype(np.uint32)
    h = HLL(14, 6, enc, None)
    blob = h.to_bytes(compress=True)
    assert len(blob) == 8 + 4 * len(enc)  # raw form kept
    assert np.array_equal(HLL.from_bytes(blob).sparse, enc)


def test_empty_unaffected_and_dense_deflates():
    e = HLL.create()
    assert HLL.from_bytes(e.to_bytes(compress=True)).equals(e)
    d = HLL.create()
    d.add_hashes(hash_int32(np.arange(1, 5000, dtype=np.int32)))
    assert not d.is_sparse
    # dense compress: zlib over raw registers (reference hll_compress PGLZ
    # analogue) — far smaller than bit-packed on mostly-zero registers,
    # exact roundtrip, merge-compatible with the uncompressed form
    blob = d.to_bytes(compress=True)
    assert len(blob) < len(d.to_bytes())
    back = HLL.from_bytes(blob)
    assert back.equals(d) and back.to_bytes() == d.to_bytes()


def test_dense_deflate_reference_scale():
    """Size magnitude parity with the reference's compressed dense counters
    (compression.ref: 2133 B total @ n=1021 just past promotion): same
    scheme (entropy-code the raw registers), so within the same ballpark."""
    h = HLL.create()
    h.add_hashes(hash_int32(np.arange(1, 1022, dtype=np.int32)))
    assert not h.is_sparse
    blob = h.to_bytes(compress=True)
    assert len(blob) < 3000  # reference: 2133 with PGLZ; raw packed: 12296
    assert HLL.from_bytes(blob).equals(h)
