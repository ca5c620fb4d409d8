"""hllspark — a PySpark-native distributed mergeable-sketch library.

HyperLogLog++ core (bit-compatible estimates with conversant/
postgres_hyperloglog where that reference is deterministic), plus sibling
mergeable sketches (count-min, Bloom, t-digest, KLL, MinHash), exposed as
Arrow-vectorized two-phase aggregations over Spark DataFrames.
"""

from .core.hll import HLL  # noqa: F401

__version__ = "0.1.0"


def configure_session(builder_or_session=None, **kw):
    """One-stop session setup (see hllspark.session) — lazy import so that
    ``import hllspark`` stays pyspark-free for core-only (numpy) use."""
    from .session import configure_session as _cs

    return _cs(builder_or_session, **kw)
