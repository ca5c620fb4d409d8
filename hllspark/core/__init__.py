from .hll import HLL  # noqa: F401
