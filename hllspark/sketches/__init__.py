"""Sibling mergeable sketches (north_rule: count-min, t-digest, KLL, Bloom)
plus MinHash, all following the HLL contract — create(params) / update(batch)
/ merge(associative+commutative) / query / versioned bytes — and runnable
through the same two-phase Spark executor (hllspark.agg.sketch_generic)."""

from .bloom import Bloom  # noqa: F401
from .countmin import CountMin  # noqa: F401
from .kll import KLL  # noqa: F401
from .minhash import MinHash  # noqa: F401
from .tdigest import TDigest  # noqa: F401
from .theta import Theta  # noqa: F401


def build(df, value_col, kind, by=None, engine="auto", **params):
    """engine="auto" sibling-sketch builder (see sketches.router) — lazy
    import so the pyspark-free core stays importable without Spark."""
    from .router import build as _build

    return _build(df, value_col, kind, by=by, engine=engine, **params)


def build_cube(df, value_col, kind, dims, sets=None, mode="cube", engine="auto", **params):
    """Multi-granularity sibling-sketch rollup (CUBE / ROLLUP / GROUPING
    SETS; see sketches.router.build_cube) — lazy import, like build()."""
    from .router import build_cube as _bc

    return _bc(df, value_col, kind, dims, sets=sets, mode=mode, engine=engine, **params)


def merge_stored(df, kind, sketch_col="sketch", by=None, engine="auto"):
    """Re-aggregate a stored sketch rollup table of any kind (see
    sketches.router.merge_stored) — lazy import, like build()."""
    from .router import merge_stored as _ms

    return _ms(df, kind, sketch_col=sketch_col, by=by, engine=engine)


def merge_stored_cube(df, kind, dims, sets=None, mode="cube", sketch_col="sketch",
                      engine="auto", gid_col="grouping_id"):
    """Derive every coarser cube granularity by merging the finest
    STORED sketches — no fact-table pass (see
    sketches.router.merge_stored_cube) — lazy import, like build()."""
    from .router import merge_stored_cube as _msc

    return _msc(df, kind, dims, sets=sets, mode=mode, sketch_col=sketch_col,
                engine=engine, gid_col=gid_col)
