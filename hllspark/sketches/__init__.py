"""Sibling mergeable sketches (north_rule: count-min, t-digest, KLL, Bloom)
plus MinHash, all following the HLL contract — create(params) / update(batch)
/ merge(associative+commutative) / query / versioned bytes — and runnable
through the same two-phase Spark executor (hllspark.agg.sketch_generic)."""

from .bloom import Bloom  # noqa: F401
from .countmin import CountMin  # noqa: F401
from .kll import KLL  # noqa: F401
from .minhash import MinHash  # noqa: F401
from .tdigest import TDigest  # noqa: F401
