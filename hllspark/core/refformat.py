"""Reference v2 on-disk format — export AND import of current-version blobs.

The reference extension's CURRENT struct version is 2 (hyperloglog.h:60).
core/legacy.py covers the v0/v1 *upgrade* path; this module closes the
interop loop for the live format, in both directions:

- ``hll_from_reference_v2`` decodes a v2 counter exactly as the extension's
  own readers do (hll_unpack / hll_decompress_* in hyperloglog.c:63-160,
  1128-1222): dense bit-packed / unpacked / PGLZ-compressed, sparse raw /
  group-varint-compressed / compressed-flag-raw (the ``b = -(b+18)``
  storage marker, hyperloglog.c:1100-1107).
- ``to_reference_bytes`` emits a v2 counter the extension can ingest
  directly (``hyperloglog_in`` is base64 of exactly these bytes,
  hyperloglog_counter.c:830-874), replicating hll_compress's decision
  rules (hyperloglog.c:921-943): sparse group-varint iff smaller than the
  raw list, dense PGLZ (strategy_always) iff smaller than the bit-packed
  form, with the same fallbacks.

The group-varint codec here is the reference's INTERLEAVED layout
(varint.h:809-941: per group of 4 deltas one tag byte — first delta in the
tag's HIGH bits — immediately followed by that group's 1-4-byte values).
This is distinct from core.hll.compress_sparse, this library's OWN
canonical sparse codec, which emits the same byte COUNT but a
tags-first layout for vectorized decode.  Both exist on purpose: the
canonical format optimizes our decode hot path; this one is wire-true.

Only MurmurHash64A sketches (hash_kind=0) may be exported — the reference
hashes with murmur, so an xxhash64-built sketch would silently poison any
counter it got merged with in Postgres.  Export refuses loudly.
"""

from __future__ import annotations

import struct

import numpy as np

from .hll import HASH_MURMUR, MAX_INDEX_BITS, HLL
# one source of truth for the shared v0/v1/v2 decode helpers and format
# flags (legacy's own v2 dispatch imports this module lazily — no cycle)
from .legacy import _FMT_UNPACKED, _dense_from, _dense_from_pglz
from .pglz import pglz_compress

_REF_HEADER = struct.Struct("<bBBBi")  # b, binbits, version, format, idx
_REF_VERSION = 2
_FMT_PACKED = 0


# -- group-varint codec (reference interleaved layout) ----------------------


def encode_group_varint_ref(enc: np.ndarray) -> bytes:
    """group_encode_sorted (varint.h:908-941): delta-encode a sorted-unique
    uint32 list; groups of 4 get a tag byte (2 bits per value byte-length,
    first value in the high bits) followed by the group's value bytes;
    the <=3 remainder deltas use continuation-bit varints."""
    n = len(enc)
    d = np.diff(enc.astype(np.uint64), prepend=np.uint64(0)).astype(np.uint32)
    ngroups = n // 4
    head = b""
    if ngroups:
        g = d[: ngroups * 4]
        lens = (1 + (g > 0xFF) + (g > 0xFFFF) + (g > 0xFFFFFF)).astype(np.int64)
        l2 = (lens - 1).reshape(-1, 4)
        tags = ((l2[:, 0] << 6) | (l2[:, 1] << 4) | (l2[:, 2] << 2) | l2[:, 3]).astype(np.uint8)
        ends = np.cumsum(lens)
        starts = ends - lens
        grp = np.arange(ngroups * 4, dtype=np.int64) // 4
        vstart = grp + 1 + starts  # each value shifted right by its group's tag bytes
        out = np.zeros(ngroups + int(ends[-1]), dtype=np.uint8)
        out[np.arange(ngroups, dtype=np.int64) + starts[0::4]] = tags
        gb = g.astype("<u4").view(np.uint8).reshape(-1, 4)
        for k in range(4):
            m = lens > k
            out[vstart[m] + k] = gb[m, k]
        head = out.tobytes()
    tail = bytearray()
    for v in d[ngroups * 4 :]:
        v = int(v)
        while True:
            b7 = v & 0x7F
            v >>= 7
            tail.append(b7 | (0x80 if v else 0))
            if not v:
                break
    return head + bytes(tail)


# total value bytes per tag byte: sum of the four 2-bit length fields + 4
_TAG_BYTES = (
    ((np.arange(256) >> 6) & 3)
    + ((np.arange(256) >> 4) & 3)
    + ((np.arange(256) >> 2) & 3)
    + (np.arange(256) & 3)
    + 4
).astype(np.int64)


def decode_group_varint_ref(payload: bytes, n: int) -> np.ndarray:
    """Inverse of encode_group_varint_ref (group_decode_sorted,
    varint.h:1218-1247) → sorted uint32 encode list of length n.

    Tag positions depend on previous groups' lengths, so one cheap loop
    (a table lookup + add per GROUP) collects the tags; everything else —
    per-value lengths, byte positions, little-endian assembly — is the same
    vectorized gather core.hll.decompress_sparse uses, which keeps bulk
    imports of stored reference rollups off the per-byte Python path."""
    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
    ngroups = n // 4
    tags = np.empty(ngroups, dtype=np.uint8)
    tag_bytes = _TAG_BYTES
    pos = 0
    for gi in range(ngroups):
        t = buf[pos]
        tags[gi] = t
        pos += 1 + tag_bytes[t]
    if ngroups:
        l2 = np.empty(ngroups * 4, dtype=np.int64)
        t64 = tags.astype(np.int64)
        l2[0::4] = (t64 >> 6) & 3
        l2[1::4] = (t64 >> 4) & 3
        l2[2::4] = (t64 >> 2) & 3
        l2[3::4] = t64 & 3
        lens = l2 + 1
        ends = np.cumsum(lens)
        cs = ends - lens  # value bytes before value j across all groups
        grp = np.arange(ngroups * 4, dtype=np.int64) // 4
        starts = grp + 1 + cs  # mirror of the encoder's position formula
        vals8 = np.zeros((ngroups * 4, 4), dtype=np.uint8)
        for k in range(4):
            m = lens > k
            vals8[m, k] = buf[starts[m] + k]
        d = vals8.view("<u4").ravel().astype(np.uint64)
    else:
        d = np.empty(0, dtype=np.uint64)
    tail = []
    for _ in range(n - ngroups * 4):
        v = 0
        s = 0
        while True:
            byte = int(buf[pos])
            pos += 1
            v |= (byte & 0x7F) << s
            if not byte & 0x80:
                break
            s += 7
        tail.append(v)
    if tail:
        d = np.concatenate([d, np.array(tail, dtype=np.uint64)])
    return np.cumsum(d).astype(np.uint32)


# -- dense register packing (reference LSB-first bit order) -----------------


def pack_registers_ref(regs: np.ndarray, binbits: int) -> bytes:
    """HLL_DENSE_SET_REGISTER bit order (hyperloglog.h:78-88): register r at
    bit offset r*binbits, LSB-first within each byte.  m*binbits is always
    byte-aligned (m a power of two >= 16, binbits 4..8)."""
    bits = np.unpackbits(
        regs.astype(np.uint8).reshape(-1, 1), axis=1, bitorder="little", count=binbits
    )
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


# -- v2 encode --------------------------------------------------------------


def to_reference_bytes(h: HLL, compress: bool = True, pglz_variant: str = "modern") -> bytes:
    """Serialize as a reference v2 counter (the bytea payload hyperloglog_in
    base64-decodes).  compress=True mirrors the stored-counter shape (the
    aggregates' finalfunc is hyperloglog_comp, sql/postgres.sql:221-261)."""
    if h.hash_kind != HASH_MURMUR:
        raise ValueError(
            "only MurmurHash64A sketches (hash_kind=0) can be exported to the "
            "reference format — rebuild with hash='murmur'; an xxhash64 sketch "
            "would corrupt any reference counter it merges with"
        )
    if h.is_sparse:
        enc = np.ascontiguousarray(h.sparse, dtype=np.uint32)
        n = len(enc)
        raw = enc.astype("<u4").tobytes()
        if compress:
            stream = encode_group_varint_ref(enc)
            if len(stream) < 4 * n:
                return _REF_HEADER.pack(-h.b, h.binbits, _REF_VERSION, _FMT_PACKED, n) + stream
            # varint didn't win: compressed-flag raw storage (b = -(b+18))
            return (
                _REF_HEADER.pack(-(h.b + MAX_INDEX_BITS), h.binbits, _REF_VERSION, _FMT_PACKED, n)
                + raw
            )
        return _REF_HEADER.pack(h.b, h.binbits, _REF_VERSION, _FMT_PACKED, n) + raw
    m = 1 << h.b
    packed_size = m * h.binbits // 8
    if compress:
        stream = pglz_compress(h.dense.tobytes(), pglz_variant)
        if stream is not None and 8 + len(stream) < packed_size:
            # PGLZ_Header: vl_len via SET_VARSIZE_COMPRESSED (little-endian
            # 4-byte varlena: (len << 2) | 2), then rawsize (hllutils.c:139-156)
            vl = ((8 + len(stream)) << 2) | 2
            return (
                _REF_HEADER.pack(-h.b, h.binbits, _REF_VERSION, _FMT_PACKED, -1)
                + struct.pack("<Ii", vl, m)
                + stream
            )
    return _REF_HEADER.pack(h.b, h.binbits, _REF_VERSION, _FMT_PACKED, -1) + pack_registers_ref(
        h.dense, h.binbits
    )


# -- v2 decode --------------------------------------------------------------


def hll_from_reference_v2(payload: bytes) -> HLL:
    """Decode a reference v2 counter (bytea content, varlena stripped)."""
    b = int.from_bytes(payload[0:1], "little", signed=True)
    binbits = payload[1]
    fmt = payload[3]
    idx = struct.unpack_from("<i", payload, 4)[0]
    data = payload[8:]
    if idx == -1:  # dense
        if b < 0:
            return HLL(-b, binbits, None, _dense_from_pglz(data, -b), HASH_MURMUR)
        return HLL(
            b, binbits, None, _dense_from(data, b, binbits, unpacked=fmt in _FMT_UNPACKED),
            HASH_MURMUR,
        )
    if b < 0:
        bb = -b
        if bb > MAX_INDEX_BITS:  # compressed flag, raw payload
            bb -= MAX_INDEX_BITS
            enc = np.frombuffer(data, dtype="<u4", count=idx).astype(np.uint32)
        else:
            enc = decode_group_varint_ref(data, idx)
        b = bb
    else:
        enc = np.frombuffer(data, dtype="<u4", count=idx).astype(np.uint32)
    # np.unique restores this library's sorted-unique sparse invariant
    return HLL(b, binbits, np.unique(enc), None, HASH_MURMUR)
