"""Theta (KMV) sketch — mergeable distinct-count sketch with BOUNDED-ERROR
set operations.

Why a seventh sibling: the reference's set-operation estimates
(hyperloglog_intersection / compliment / symmetric_diff,
hyperloglog_counter.c:1102-1185) are inclusion–exclusion over HLL union
estimates, whose ABSOLUTE error scales with the UNION — a small
intersection of two large sets drowns in it (the reference's own
docs/REFERENCE.md concedes intersection accuracy degrades sharply).  A
theta sketch intersects the retained-sample sets directly: every set-op
estimate is `|retained result| / θ` with relative error ~1/√(k·J-ish) on
the RESULT, not the union.  For corpus-overlap measurement between crawl
snapshots / training shards — the motivating 100 TB pipeline use — this is
the right tool, and it composes with the same two-phase Spark executor as
every other sibling (hllspark.agg.sketch_generic).

Semantics (Beyer et al. 2007 KMV; Dasgupta et al. 2016 theta framework):
the sketch retains the k smallest DISTINCT 64-bit hash values below a
threshold θ.  While fewer than k+1 distinct values have been seen, θ = 2⁶⁴
and the sketch is EXACT.  Past that, θ = the (k+1)-th smallest hash of the
underlying value SET and the k smaller ones are retained.  Estimate =
|retained| · 2⁶⁴/θ.

DETERMINISM (this library's merge invariant, CLAUDE.md): unlike
DataSketches' quickselect variant (whose θ depends on insertion/trim
history), the canonical trim rule here — sort the candidate union, keep k,
θ := candidate[k] — makes (retained set, θ) a PURE FUNCTION of the value
set: by induction every merge either keeps all candidates below min(θa,θb)
(in which case that min already equals the (k+1)-th smallest of the united
value set, or the sketch is still exact) or re-trims to exactly the
(k+1)-th smallest of the united set.  Hence byte-identical sketches across
any partition/merge topology — pinned in tests/test_theta.py.

Set ops (all at θ∩ = min(θa, θb), each estimate = count · 2⁶⁴/θ∩):
intersection = |Sa ∩ Sb ∩ [0,θ∩)|; a_not_b = |Sa∩[0,θ∩) − Sb|; union =
merge-then-estimate.  Error: intersection/difference std-err ≈
√(est·union)/√k in cardinality terms — still proportional to the RESULT'S
own magnitude for overlaps that the sample resolves, vs inclusion–
exclusion's union-scale error.
"""

from __future__ import annotations

import struct

import numpy as np

from ..core.hash import hash_arrow_array

_HEADER = struct.Struct("<BBIqQ")  # version, hash_kind, k, n_added, theta
_VERSION = 1
_MAX_THETA = 0xFFFFFFFFFFFFFFFF  # 2^64 - 1 stands in for 2^64 ("exact mode")


class Theta:
    __slots__ = ("k", "hashes", "theta", "n_added", "hash_kind")

    def __init__(
        self,
        k: int,
        hashes: np.ndarray,
        theta: int = _MAX_THETA,
        n_added: int = 0,
        hash_kind: int = 0,
    ):
        self.k = k
        self.hashes = hashes  # sorted-unique uint64, all < theta, len <= k
        self.theta = theta  # exclusive upper bound; _MAX_THETA = exact mode
        self.n_added = n_added
        self.hash_kind = hash_kind

    @classmethod
    def create(cls, k: int = 4096, hash_kind: int = 0) -> "Theta":
        if not 16 <= k <= (1 << 26):
            raise ValueError("k must be in [16, 2^26]")
        return cls(k, np.empty(0, dtype=np.uint64), _MAX_THETA, 0, hash_kind)

    # -- updates ------------------------------------------------------------

    def _trim(self, cand: np.ndarray) -> None:
        """Canonical trim: cand is sorted-unique, all < current theta.  If it
        overflows k, theta becomes cand[k] — the (k+1)-th smallest of the
        underlying value set (see module docstring) — making the state a
        pure function of that set."""
        if len(cand) > self.k:
            self.theta = int(cand[self.k])
            cand = cand[: self.k]
        self.hashes = cand

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64, copy=False)
        if len(h) == 0:
            return
        self.n_added += len(h)
        if self.theta != _MAX_THETA:
            h = h[h < np.uint64(self.theta)]
            if len(h) == 0:
                return
        self._trim(np.union1d(self.hashes, h))

    def update_arrow(self, arr, input_type: str = "auto") -> None:
        self.add_hashes(hash_arrow_array(arr, input_type))

    def merge(self, other: "Theta") -> "Theta":
        if self.k != other.k:
            raise ValueError("theta sketch k differs")
        if self.hash_kind != other.hash_kind:
            raise ValueError("hash kind of sketches differs")
        theta = min(self.theta, other.theta)
        t = np.uint64(theta)
        a = self.hashes if theta == self.theta else self.hashes[self.hashes < t]
        b = other.hashes if theta == other.theta else other.hashes[other.hashes < t]
        self.theta = theta
        self.n_added += other.n_added
        self._trim(np.union1d(a, b))
        return self

    def copy(self) -> "Theta":
        return Theta(self.k, self.hashes.copy(), self.theta, self.n_added, self.hash_kind)

    # -- queries ------------------------------------------------------------

    def _theta_frac(self) -> float:
        return (self.theta + 1 if self.theta == _MAX_THETA else self.theta) / 2.0**64

    def estimate(self) -> float:
        if self.theta == _MAX_THETA:
            return float(len(self.hashes))  # exact mode
        return len(self.hashes) / self._theta_frac()

    def is_exact(self) -> bool:
        return self.theta == _MAX_THETA

    @staticmethod
    def _common(a: "Theta", b: "Theta") -> tuple[np.ndarray, np.ndarray, float]:
        if a.k != b.k:
            raise ValueError("theta sketch k differs")
        if a.hash_kind != b.hash_kind:
            raise ValueError("hash kind of sketches differs")
        theta = min(a.theta, b.theta)
        t = np.uint64(theta)
        sa = a.hashes if theta == a.theta else a.hashes[a.hashes < t]
        sb = b.hashes if theta == b.theta else b.hashes[b.hashes < t]
        frac = (theta + 1 if theta == _MAX_THETA else theta) / 2.0**64
        return sa, sb, frac

    def intersection_estimate(self, other: "Theta") -> float:
        sa, sb, frac = Theta._common(self, other)
        return len(np.intersect1d(sa, sb, assume_unique=True)) / frac

    def a_not_b_estimate(self, other: "Theta") -> float:
        sa, sb, frac = Theta._common(self, other)
        return len(np.setdiff1d(sa, sb, assume_unique=True)) / frac

    def union_estimate(self, other: "Theta") -> float:
        return self.copy().merge(other).estimate()

    def jaccard_estimate(self, other: "Theta") -> float:
        sa, sb, _ = Theta._common(self, other)
        u = len(np.union1d(sa, sb))
        if u == 0:
            return 0.0
        return len(np.intersect1d(sa, sb, assume_unique=True)) / u

    def equals(self, other: "Theta") -> bool:
        if self.k != other.k or self.hash_kind != other.hash_kind:
            raise ValueError("sketch parameters differ")
        return self.theta == other.theta and bool(np.array_equal(self.hashes, other.hashes))

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        return _HEADER.pack(
            _VERSION, self.hash_kind, self.k, self.n_added, self.theta
        ) + self.hashes.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "Theta":
        version, hash_kind, k, n_added, theta = _HEADER.unpack_from(data, 0)
        if version > _VERSION:
            raise ValueError(f"unsupported theta sketch version {version}")
        n = (len(data) - _HEADER.size) // 8
        hashes = np.frombuffer(data, dtype="<u8", count=n, offset=_HEADER.size).astype(np.uint64)
        return cls(k, hashes, theta, n_added, hash_kind)
