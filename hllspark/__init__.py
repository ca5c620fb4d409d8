"""hllspark — a PySpark-native distributed mergeable-sketch library.

HyperLogLog++ core (bit-compatible estimates with conversant/
postgres_hyperloglog where that reference is deterministic), plus sibling
mergeable sketches (count-min, Bloom, t-digest, KLL, MinHash), exposed as
Arrow-vectorized two-phase aggregations over Spark DataFrames.
"""

from .core.hll import HLL  # noqa: F401

__version__ = "0.1.0"
