"""Reference v2 wire-format interop: PGLZ encoder goldens against real
Postgres-produced streams, group-varint layout parity via compression.ref
size goldens, full export→import roundtrips, and the hll_compress decision
rules (hyperloglog.c:921-1115)."""

import binascii
import re
import struct

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hllspark.core.hash import hash_int32, hash_strings
from hllspark.core.hll import HASH_XXHASH_SPARK, HLL
from hllspark.core.legacy import hll_from_reference_bytes, pglz_decompress, upgrade_bytes
from hllspark.core.pglz import pglz_compress
from hllspark.core.refformat import (
    decode_group_varint_ref,
    encode_group_varint_ref,
    pack_registers_ref,
    to_reference_bytes,
)

UPDATE_SQL = "/root/reference/test/sql/update.sql"

# length(hyperloglog_accum(i)) over generate_series(1,n) from
# test/sql/compression.ref — VARSIZE_ANY of the STORED (compressed) counter.
# VARSIZE counts the 4-byte varlena + sizeof(HLLData)=16 (12 fields + data[1]
# + alignment padding), i.e. our payload + 8.
COMPRESSION_REF_TOTALS = {
    1: 20,
    100: 330,
    500: 1450,
    1000: 2643,
    1020: 2689,
    1021: 2133,
    10000: 6355,
    100000: 9400,
}


def _fixture_dense_pglz_blobs():
    """The v0/v1 dense fixtures in update.sql carry real Postgres-produced
    PGLZ streams.  Their PGLZ_Header vl_len (big-endian len|compressed-flag
    in these dumps) reveals the true stream length — the blob itself holds
    4 extra bytes of allocator slack (hyperloglog.c:954-956's +4 overflow)."""
    sql = open(UPDATE_SQL).read()
    out = []
    for hx in re.findall(r"decode\(E'([0-9a-f]+)'", sql):
        payload = binascii.unhexlify(hx)
        b = int.from_bytes(payload[0:1], "little", signed=True)
        version = payload[2]
        if b >= 0 or version > 1:
            continue
        data = payload[4:] if version == 0 else payload[8:]
        if version == 1 and struct.unpack_from("<i", payload, 4)[0] != -1:
            continue
        vl_be = int.from_bytes(data[0:4], "big")
        rawsize = int.from_bytes(data[4:8], "little")
        stream_len = (vl_be & 0x3FFFFFFF) - 8
        out.append((version, rawsize, data[8 : 8 + stream_len]))
    return out


class TestPglz:
    def test_fixture_streams_reproduced_byte_exact(self):
        """Re-compressing the decompressed fixture registers reproduces the
        real Postgres pglz_compress(strategy_always) output BYTE-FOR-BYTE —
        pinning good_match=128 / good_drop=6 and the whole match search."""
        blobs = _fixture_dense_pglz_blobs()
        assert len(blobs) >= 2  # one v0 + one v1 dense fixture
        for version, rawsize, stream in blobs:
            raw = pglz_decompress(stream, rawsize)
            for variant in ("modern", "legacy"):
                assert pglz_compress(raw, variant) == stream, (version, variant)

    @pytest.mark.parametrize("variant", ["modern", "legacy"])
    def test_roundtrip_adversarial(self, variant):
        rng = np.random.RandomState(11)
        cases = [
            b"\x00" * 5000,  # long run: max-match (273) + overlapping copies
            bytes(range(256)) * 8,  # periodic, offset boundaries
            rng.randint(0, 4, size=3000, dtype=np.uint8).tobytes(),  # compressible noise
            rng.randint(0, 256, size=100, dtype=np.uint8).tobytes() * 50,  # far offsets
            b"ab" * 3 + b"\xff" * 20 + b"ab" * 3,  # short matches around len-3 floor
            (b"x" * 17) + b"Q" + (b"x" * 18),  # tag len 17/18 boundary
        ]
        for data in cases:
            stream = pglz_compress(data, variant)
            assert stream is not None
            assert len(stream) < len(data)
            assert pglz_decompress(stream, len(data)) == data

    @pytest.mark.parametrize("variant", ["modern", "legacy"])
    def test_incompressible_returns_none(self, variant):
        rng = np.random.RandomState(3)
        data = rng.randint(0, 256, size=4096, dtype=np.uint8).tobytes()
        assert pglz_compress(data, variant) is None

    def test_small_inputs_cross_hashsz_thresholds(self):
        # modern variant scales its hash table at 128/256/512/1024 bytes
        for n in (1, 8, 127, 128, 255, 256, 511, 512, 1023, 1024, 2000):
            data = (b"abcd" * (n // 4 + 1))[:n]
            for variant in ("modern", "legacy"):
                stream = pglz_compress(data, variant)
                if stream is not None:
                    assert pglz_decompress(stream, n) == data

    def test_unknown_variant_rejected(self):
        with pytest.raises(ValueError):
            pglz_compress(b"abc", "pg96")

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.one_of(
            st.binary(min_size=1, max_size=2000),
            # low-entropy alphabets exercise long matches + history recycling
            st.lists(st.sampled_from([0, 1, 7, 255]), min_size=1, max_size=6000).map(bytes),
        ),
        variant=st.sampled_from(["modern", "legacy"]),
    )
    def test_roundtrip_property(self, data, variant):
        stream = pglz_compress(data, variant)
        if stream is not None:
            assert len(stream) < len(data)
            assert pglz_decompress(stream, len(data)) == data


class TestV2DecodeProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        n=st.integers(0, 1500),
        b=st.integers(4, 16),
        binbits=st.integers(4, 8),
    )
    def test_export_import_identity(self, seed, n, b, binbits):
        rng = np.random.RandomState(seed)
        h = HLL.create(b=b, binbits=binbits)
        if n:
            h.add_hashes(rng.randint(0, 2**63, size=n).astype(np.uint64))
        for compress in (True, False):
            blob = to_reference_bytes(h, compress=compress)
            assert hll_from_reference_bytes(blob).to_bytes() == h.to_bytes()


class TestGroupVarintRef:
    def test_roundtrip_boundary_deltas(self):
        rng = np.random.default_rng(7)
        for _ in range(25):
            n = int(rng.integers(1, 300))
            deltas = rng.choice(
                [1, 0xFF, 0x100, 0xFFFF, 0x10000, 0xFFFFFF, 0x1000000, 7], size=n
            ).astype(np.uint64)
            enc = np.cumsum(deltas)
            enc = enc[enc <= 0xFFFFFFFF].astype(np.uint32)
            if not len(enc):
                continue
            st = encode_group_varint_ref(enc)
            assert np.array_equal(decode_group_varint_ref(st, len(enc)), enc)

    def test_same_size_as_canonical_codec(self):
        """The interleaved reference layout and our tags-first canonical codec
        must always agree on SIZE (identical tag/length rules)."""
        from hllspark.core.hll import compress_sparse

        rng = np.random.RandomState(5)
        for n in (1, 2, 3, 4, 5, 100, 1020):
            enc = np.unique(rng.randint(0, 2**32, size=n, dtype=np.int64).astype(np.uint32))
            assert len(encode_group_varint_ref(enc)) == len(compress_sparse(enc))

    def test_interleaved_layout_tag_high_bits_first(self):
        # deltas 1, 0x100, 0x10000, 0x1000000 → lens 1,2,3,4 → tag 0b00011011
        enc = np.cumsum(np.array([1, 0x100, 0x10000, 0x1000000], dtype=np.uint64)).astype(
            np.uint32
        )
        st = encode_group_varint_ref(enc)
        assert st[0] == 0b00011011
        assert len(st) == 1 + 1 + 2 + 3 + 4


class TestReferenceV2:
    @pytest.mark.parametrize("n", sorted(COMPRESSION_REF_TOTALS))
    def test_export_length_matches_compression_ref(self, n):
        """End-to-end stored-counter length parity with the reference's own
        regression outputs — for the dense rows this pins the PGLZ encoder
        output size through the real register payloads."""
        h = HLL.create()
        h.add_hashes(hash_int32(np.arange(1, n + 1, dtype=np.int32)))
        blob = to_reference_bytes(h, compress=True)
        assert len(blob) + 8 == COMPRESSION_REF_TOTALS[n]

    @pytest.mark.parametrize("n", [0, 1, 4, 5, 100, 1020, 1021, 5000, 100000])
    @pytest.mark.parametrize("compress", [True, False])
    def test_roundtrip_canonical_identity(self, n, compress):
        h = HLL.create()
        if n:
            h.add_hashes(hash_strings(pd.Series([f"v{i}" for i in range(n)])))
        blob = to_reference_bytes(h, compress=compress)
        back = hll_from_reference_bytes(blob)
        assert back.to_bytes() == h.to_bytes()
        assert back.estimate() == h.estimate()
        # upgrade path accepts the current version too
        assert upgrade_bytes(blob) == h.to_bytes()

    def test_packed_dense_layout_lsb_first(self):
        h = HLL.create()
        h.add_hashes(hash_int32(np.arange(1, 5000, dtype=np.int32)))
        assert not h.is_sparse
        blob = to_reference_bytes(h, compress=False)
        b, binbits, version, fmt = struct.unpack_from("<bBBB", blob, 0)
        idx = struct.unpack_from("<i", blob, 4)[0]
        assert (version, fmt, idx) == (2, 0, -1)
        assert len(blob) == 8 + (1 << b) * binbits // 8
        # reference LSB-first order: register r at bit offset r*binbits
        packed = np.frombuffer(blob[8:], dtype=np.uint8)
        bits = np.unpackbits(packed, bitorder="little")
        regs = bits.reshape(-1, binbits) @ (1 << np.arange(binbits))
        assert np.array_equal(regs.astype(np.uint8), h.dense)

    def test_unpacked_dense_v2_imports(self):
        """A v2 blob in UNPACKED format (what hyperloglog_decomp emits) must
        decode too (hll_unpack early-return path)."""
        h = HLL.create()
        h.add_hashes(hash_int32(np.arange(1, 3000, dtype=np.int32)))
        blob = struct.pack("<bBBBi", h.b, h.binbits, 2, 2, -1) + h.dense.tobytes()
        assert hll_from_reference_bytes(blob).to_bytes() == h.to_bytes()

    def test_sparse_compressed_flag_raw_storage(self):
        """hll_compress_sparse's b=-(b+18) marker: group-varint didn't win,
        raw uint32 list stored under the compressed flag
        (hyperloglog.c:1100-1107)."""
        enc = (np.arange(1, 200, dtype=np.uint64) * (2**24 + 7)).astype(np.uint32)
        enc = np.unique(enc)
        h = HLL(14, 6, enc, None)
        blob = to_reference_bytes(h, compress=True)
        b = struct.unpack_from("<b", blob, 0)[0]
        assert b == -(14 + 18)
        assert len(blob) == 8 + 4 * len(enc)
        assert hll_from_reference_bytes(blob).to_bytes() == h.to_bytes()

    def test_pglz_loses_falls_back_to_packed(self):
        """Saturated high-entropy registers: PGLZ can't beat the bit-packed
        form, so the export stays uncompressed-PACKED with positive b
        (hyperloglog.c:982-991 keep-if-smaller)."""
        rng = np.random.RandomState(9)
        h = HLL(14, 6, None, rng.randint(1, 64, size=1 << 14).astype(np.uint8))
        blob = to_reference_bytes(h, compress=True)
        assert struct.unpack_from("<b", blob, 0)[0] == 14
        assert len(blob) == 8 + (1 << 14) * 6 // 8
        assert hll_from_reference_bytes(blob).to_bytes() == h.to_bytes()

    def test_export_refuses_xxhash_sketches(self):
        h = HLL.create(hash_kind=HASH_XXHASH_SPARK)
        h.add_hashes(np.arange(1, 100, dtype=np.uint64))
        with pytest.raises(ValueError, match="MurmurHash64A"):
            to_reference_bytes(h)

    def test_pglz_header_fields(self):
        h = HLL.create()
        h.add_hashes(hash_int32(np.arange(1, 10000, dtype=np.int32)))
        blob = to_reference_bytes(h, compress=True)
        assert struct.unpack_from("<b", blob, 0)[0] == -h.b
        vl, rawsize = struct.unpack_from("<Ii", blob, 8)
        stream_len = len(blob) - 16
        # SET_VARSIZE_COMPRESSED little-endian 4-byte header: (len<<2)|2
        assert vl == ((8 + stream_len) << 2) | 2
        assert rawsize == 1 << h.b
