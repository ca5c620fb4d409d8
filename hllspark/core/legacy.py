"""Legacy reference-blob decoding — the hyperloglog_update upgrade path.

Decodes the reference extension's own on-disk formats (upgrade.c:24-149) so
stored counters from a v0/v1 deployment can be read directly:

- version 0 (8-byte struct header; payload here = bytea content, i.e. struct
  minus the 4-byte varlena): ``b binbits version pad`` then register data —
  bit-packed when b > 0, PGLZ-compressed unpacked bytes when b < 0
  (upgrade.c:28-45).
- version 1 (adds format/idx fields; data at struct offset 12 = payload
  offset 8): sparse = raw uint32 encode list (v1 "sparse compression" was
  storage-only, upgrade.c:131-149), dense = bit-packed or PGLZ per the b
  sign and format field (upgrade.c:86-125).

PGLZ is PostgreSQL's public LZ format (control byte per 8 items; match tag
``len-3`` in the low nibble, 12-bit offset in high nibble + next byte,
length-18 extension byte).  Only the decoder is needed — upgraded counters
re-serialize in this library's own format.

Verified against the reference's own hex fixtures
(test/sql/update.sql:5-29), reproducing every update.ref estimate to 10
decimals (tests/test_versioning_encoding.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .hll import HLL

_FMT_UNPACKED = (2, 3)  # UNPACKED / UNPACKED_UNPACKED (hyperloglog.h:61-64)


def _unpack_registers_ref(packed: np.ndarray, m: int, binbits: int) -> np.ndarray:
    """Reference bit order (HLL_DENSE_GET_REGISTER, hyperloglog.h:66-74):
    register r lives at bit offset r*binbits, LSB-first within each byte —
    distinct from this library's own MSB-first serialized packing."""
    bits = np.unpackbits(packed, bitorder="little", count=m * binbits).reshape(m, binbits)
    weights = (1 << np.arange(binbits, dtype=np.uint16)).astype(np.uint16)
    return (bits.astype(np.uint16) @ weights).astype(np.uint8)


def pglz_decompress(src: bytes, rawsize: int) -> bytes:
    """PostgreSQL PGLZ decompression (public format)."""
    out = bytearray()
    i, n = 0, len(src)
    while len(out) < rawsize and i < n:
        ctrl = src[i]
        i += 1
        for _ in range(8):
            if len(out) >= rawsize or i >= n:
                break
            if ctrl & 1:
                b0, b1 = src[i], src[i + 1]
                i += 2
                length = (b0 & 0x0F) + 3
                off = ((b0 & 0xF0) << 4) | b1
                if length == 18:
                    length += src[i]
                    i += 1
                for _ in range(length):  # overlapping copies are the point
                    out.append(out[-off])
            else:
                out.append(src[i])
                i += 1
            ctrl >>= 1
    if len(out) != rawsize:
        raise ValueError(f"PGLZ stream ended early: {len(out)} of {rawsize} bytes")
    return bytes(out)


def _dense_from(data: bytes, b: int, binbits: int, unpacked: bool) -> np.ndarray:
    m = 1 << b
    if unpacked:
        return np.frombuffer(data, dtype=np.uint8, count=m).copy()
    nbytes = (m * binbits + 7) // 8
    return _unpack_registers_ref(np.frombuffer(data, dtype=np.uint8, count=nbytes), m, binbits)


def _dense_from_pglz(data: bytes, b: int) -> np.ndarray:
    # PGLZ_Header = {vl_len int32, rawsize int32}; stream follows.  The
    # compressed source is always the UNPACKED byte-per-register array
    # (hll_decompress_dense_V1, upgrade.c:86-125).
    rawsize = struct.unpack_from("<i", data, 4)[0]
    if rawsize != (1 << b):
        raise ValueError(f"PGLZ rawsize {rawsize} != 2^b registers {1 << b}")
    return np.frombuffer(pglz_decompress(data[8:], rawsize), dtype=np.uint8).copy()


def hll_from_reference_bytes(payload: bytes) -> HLL:
    """Decode a reference v0/v1 counter (bytea content, varlena stripped)."""
    b = int.from_bytes(payload[0:1], "little", signed=True)
    binbits = payload[1]
    version = payload[2]
    if version == 0:
        data = payload[4:]
        if b < 0:
            return HLL(-b, binbits, None, _dense_from_pglz(data, -b))
        return HLL(b, binbits, None, _dense_from(data, b, binbits, unpacked=False))
    if version == 1:
        fmt = payload[3]
        idx = struct.unpack_from("<i", payload, 4)[0]
        data = payload[8:]
        compressed = b < 0
        b = abs(b)
        if idx == -1:  # dense
            if compressed:
                return HLL(b, binbits, None, _dense_from_pglz(data, b))
            return HLL(b, binbits, None, _dense_from(data, b, binbits, unpacked=fmt in _FMT_UNPACKED))
        # sparse: raw encode list either way (v1 compression was storage-only);
        # np.unique restores this library's canonical sorted-unique invariant
        enc = np.unique(np.frombuffer(data, dtype="<u4", count=idx).astype(np.uint32))
        return HLL(b, binbits, enc, None)
    if version == 2:  # the CURRENT reference format — full codec in refformat
        from .refformat import hll_from_reference_v2

        return hll_from_reference_v2(payload)
    raise ValueError(f"unsupported legacy version {version}")


def upgrade_bytes(data: bytes) -> bytes:
    """hyperloglog_update: accept this library's own format OR a reference
    v0/v1 blob, re-serialized canonically (current version)."""
    try:
        return HLL.from_bytes(data).to_bytes()
    except Exception:
        return hll_from_reference_bytes(bytes(data)).to_bytes()
