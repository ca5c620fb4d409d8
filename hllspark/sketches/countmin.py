"""Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
estimation under the same two-phase contract as HLL (SURVEY.md §2.8):
create / update(batch) / merge(elementwise +) / query / versioned bytes.

Point-query guarantee: est >= true, and est <= true + eps*N with probability
>= 1-delta, where eps = e/width and delta = e^-depth.  Row hash functions
are pairwise-independent via double hashing of the 64-bit item hash
(h1 + j*h2 splits of MurmurHash64A / xxhash64 output).
"""

from __future__ import annotations

import struct

import numpy as np

from ..core.hash import hash_arrow_array

_HEADER = struct.Struct("<BBHIq")  # version, hash_kind, depth, width, total
_VERSION = 1


class CountMin:
    __slots__ = ("width", "depth", "counts", "total", "hash_kind")

    def __init__(self, width: int, depth: int, counts: np.ndarray, total: int = 0, hash_kind: int = 0):
        self.width = width
        self.depth = depth
        self.counts = counts  # (depth, width) uint64
        self.total = total
        self.hash_kind = hash_kind

    @classmethod
    def create(cls, width: int = 4096, depth: int = 5, hash_kind: int = 0) -> "CountMin":
        if width < 2 or depth < 1 or depth > 64:
            raise ValueError("width must be >=2, depth in [1,64]")
        return cls(width, depth, np.zeros((depth, width), dtype=np.uint64), 0, hash_kind)

    @classmethod
    def from_error(cls, epsilon: float = 0.001, delta: float = 0.01) -> "CountMin":
        width = int(np.ceil(np.e / epsilon))
        depth = int(np.ceil(np.log(1.0 / delta)))
        return cls.create(width, depth)

    # -- updates --------------------------------------------------------------

    def _row_indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) bucket indices via double hashing h1 + j*h2."""
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → full-period stride
        j = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + j * h2[None, :]) % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, h: np.ndarray, weights: np.ndarray | None = None) -> None:
        h = h.astype(np.uint64, copy=False)
        if len(h) == 0:
            return
        idx = self._row_indices(h)
        if weights is None:
            w = np.uint64(1)
            for j in range(self.depth):
                np.add.at(self.counts[j], idx[j], w)
            self.total += len(h)
        else:
            wt = weights.astype(np.uint64)
            for j in range(self.depth):
                np.add.at(self.counts[j], idx[j], wt)
            self.total += int(weights.sum())

    def update_arrow(self, arr, input_type: str = "auto") -> None:
        self.add_hashes(hash_arrow_array(arr, input_type))

    # -- queries ---------------------------------------------------------------

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        """Estimated frequency per item (vectorized min over rows)."""
        h = h.astype(np.uint64, copy=False)
        if len(h) == 0:
            return np.empty(0, dtype=np.int64)
        idx = self._row_indices(h)
        ests = np.stack([self.counts[j][idx[j]] for j in range(self.depth)])
        return ests.min(axis=0).astype(np.int64)

    def query_arrow(self, arr, input_type: str = "auto") -> np.ndarray:
        return self.query_hashes(hash_arrow_array(arr, input_type))

    @property
    def epsilon(self) -> float:
        return float(np.e / self.width)

    # -- algebra ----------------------------------------------------------------

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("count-min dimensions differ")
        if self.hash_kind != other.hash_kind:
            raise ValueError("hash kind of sketches differs")
        self.counts += other.counts
        self.total += other.total
        return self

    def copy(self) -> "CountMin":
        return CountMin(self.width, self.depth, self.counts.copy(), self.total, self.hash_kind)

    # -- serialization ----------------------------------------------------------

    def to_bytes(self) -> bytes:
        # store the narrowest dtype that fits (dense uint64 grids compress
        # poorly; most cells are small)
        mx = int(self.counts.max()) if self.counts.size else 0
        dtype = np.uint8 if mx < 2**8 else np.uint16 if mx < 2**16 else np.uint32 if mx < 2**32 else np.uint64
        payload = self.counts.astype(dtype).tobytes()
        return _HEADER.pack(_VERSION, self.hash_kind, self.depth, self.width, self.total) + payload

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMin":
        version, hash_kind, depth, width, total = _HEADER.unpack_from(data, 0)
        if version > _VERSION:
            raise ValueError(f"unsupported countmin version {version}")
        itemsize = (len(data) - _HEADER.size) // (depth * width)
        dt = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[itemsize]
        counts = np.frombuffer(data, dtype=dt, count=depth * width, offset=_HEADER.size)
        return cls(width, depth, counts.reshape(depth, width).astype(np.uint64), total, hash_kind)
