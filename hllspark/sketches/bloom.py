"""Bloom filter (Bloom 1970) — mergeable set membership, Sketch protocol.

k bit positions via double hashing (Kirsch & Mitzenmacher 2006: h1 + j*h2 is
asymptotically as good as k independent hashes).  Merge = bitwise OR.
False-positive rate ≈ (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..core.hash import hash_arrow_array

_HEADER = struct.Struct("<BBHqq")  # version, hash_kind, k, m_bits, n_added
_VERSION = 1


class Bloom:
    __slots__ = ("m_bits", "k", "bits", "n_added", "hash_kind")

    def __init__(self, m_bits: int, k: int, bits: np.ndarray, n_added: int = 0, hash_kind: int = 0):
        self.m_bits = m_bits
        self.k = k
        self.bits = bits  # uint8 array of ceil(m/8) bytes (bit-packed)
        self.n_added = n_added
        self.hash_kind = hash_kind

    @classmethod
    def create(cls, m_bits: int = 1 << 20, k: int = 7, hash_kind: int = 0) -> "Bloom":
        if m_bits < 8 or k < 1 or k > 64:
            raise ValueError("m_bits must be >=8, k in [1,64]")
        return cls(m_bits, k, np.zeros((m_bits + 7) // 8, dtype=np.uint8), 0, hash_kind)

    @classmethod
    def from_capacity(cls, n: int, fp_rate: float = 0.01) -> "Bloom":
        m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
        k = max(1, int(round(m / n * math.log(2))))
        return cls.create(((m + 7) // 8) * 8, min(k, 64))

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        j = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + j * h2[None, :]) % np.uint64(self.m_bits)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64, copy=False)
        if len(h) == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        self.n_added += len(h)

    def update_arrow(self, arr, input_type: str = "auto") -> None:
        self.add_hashes(hash_arrow_array(arr, input_type))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64, copy=False)
        if len(h) == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(h)  # (k, n)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def contains_arrow(self, arr, input_type: str = "auto") -> np.ndarray:
        return self.contains_hashes(hash_arrow_array(arr, input_type))

    def fp_rate(self) -> float:
        """Expected false-positive rate at the current fill."""
        if self.n_added == 0:
            return 0.0
        return (1.0 - math.exp(-self.k * self.n_added / self.m_bits)) ** self.k

    def merge(self, other: "Bloom") -> "Bloom":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("bloom dimensions differ")
        if self.hash_kind != other.hash_kind:
            raise ValueError("hash kind of sketches differs")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added  # upper bound (duplicates double-counted)
        return self

    def copy(self) -> "Bloom":
        return Bloom(self.m_bits, self.k, self.bits.copy(), self.n_added, self.hash_kind)

    def to_bytes(self) -> bytes:
        return _HEADER.pack(_VERSION, self.hash_kind, self.k, self.m_bits, self.n_added) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "Bloom":
        version, hash_kind, k, m_bits, n_added = _HEADER.unpack_from(data, 0)
        if version > _VERSION:
            raise ValueError(f"unsupported bloom version {version}")
        bits = np.frombuffer(data, dtype=np.uint8, count=(m_bits + 7) // 8, offset=_HEADER.size).copy()
        return cls(m_bits, k, bits, n_added, hash_kind)
