"""Golden-parity tests vs the reference regression suite.

Every expected value below is a published output of the reference's
deterministic tests (/root/reference/test/sql/{aggs,set_ops,base}.ref),
reproduced here because we use the identical hash (MurmurHash64A, seed
0xadc83b19), identical sparse encoding, and identical HLL++ estimator
constants.  Integers are hashed as 4-byte LE (Postgres int4 datums); text as
raw UTF-8 bytes (hyperloglog_counter.c:536-547).
"""

import math

import numpy as np
import pandas as pd
import pytest

from hllspark.core.hash import hash_int32, hash_strings
from hllspark.core.hll import (
    HLL,
    compliment_estimate,
    intersection_estimate,
    params_from_error,
    predict_dense_size,
    sparse_capacity,
    symmetric_diff_estimate,
    union_estimate,
)

REL_TOL = 5e-10  # goldens are printed to 10 decimals


def series_int(n: int, start: int = 1) -> HLL:
    h = HLL.create()
    h.add_hashes(hash_int32(np.arange(start, start + n, dtype=np.int32)))
    return h


def series_text(n: int) -> HLL:
    h = HLL.create()
    h.add_hashes(hash_strings(pd.Series([str(i) for i in range(1, n + 1)])))
    return h


def test_default_params():
    # hyperloglog_counter.c:27-29 + the 16384-boundary case (SURVEY.md §1.2)
    assert params_from_error() == (14, 6)
    assert predict_dense_size() == 12304  # test/sql/base.sql:4
    assert sparse_capacity(14) == 1020  # hllutils.c:112-116


@pytest.mark.parametrize(
    "n,expected,sparse",
    [
        (1, 1.0000000149, True),  # aggs.ref:32
        (100, 100.0001490110, True),  # aggs.ref:38
        (1020, 1020.0155034860, True),  # aggs.ref:44 (last sparse)
        (1021, None, False),  # promotion edge (compression.ref: dense @1021)
        (10000, 9998.4010348519, False),  # aggs.ref:50 (linear-counting dense)
        (100000, 98643.3506821464, False),  # aggs.ref:56 (bias-corrected HLL)
    ],
)
def test_int_series_goldens(n, expected, sparse):
    h = series_int(n)
    assert h.is_sparse == sparse
    if expected is not None:
        assert h.estimate() == pytest.approx(expected, rel=REL_TOL)


@pytest.mark.parametrize(
    "n,expected",
    [
        (1, 1.0000000149),  # aggs.ref:61
        (100, 100.0001490110),  # aggs.ref:63 (text collides nowhere at n=100)
        (100000, 98924.8726897958),  # aggs.ref:69
    ],
)
def test_text_series_goldens(n, expected):
    assert series_text(n).estimate() == pytest.approx(expected, rel=REL_TOL)


def test_grouped_merge_goldens():
    # aggs.sql:58-116 — 100 groups, one counter each, then merge-aggregate
    sketches = [series_int(400, start=g * 400 + 1) for g in range(1, 101)]
    tot = sketches[0].copy()
    for s in sketches[1:]:
        tot.merge(s)
    assert tot.estimate() == pytest.approx(39919.5552642784, rel=REL_TOL)
    assert round(tot.estimate()) == 39920  # sum() → bigint golden

    sketches = [series_int(10000, start=g * 10000 + 1) for g in range(1, 101)]
    tot = sketches[0].copy()
    for s in sketches[1:]:
        tot.merge(s)
    assert tot.estimate() == pytest.approx(997108.2623389870, rel=REL_TOL)
    assert round(tot.estimate()) == 997108


def test_merge_mixed_sizes_golden():
    # aggs.sql:118-138 — 1000-counter ∪ 2000-counter, both directions
    a = series_int(1000)
    b = series_int(2000)
    assert union_estimate(a, b) == pytest.approx(2003.6736018625, rel=REL_TOL)
    assert union_estimate(b, a) == pytest.approx(2003.6736018625, rel=REL_TOL)


def test_set_ops_goldens():
    # set_ops.sql:5-39 — disjoint 10k vs 10k domains
    a = series_int(10000)  # 1..10000
    neg = HLL.create()
    neg.add_hashes(hash_int32(np.arange(-10000, 0, dtype=np.int32)))
    assert intersection_estimate(a, neg) == pytest.approx(190.2099608925, rel=REL_TOL)
    # identical counters
    assert union_estimate(a, a) == pytest.approx(9998.4010348519, rel=REL_TOL)
    assert compliment_estimate(a, a) == pytest.approx(0.0, abs=1e-9)
    assert symmetric_diff_estimate(a, a) == pytest.approx(0.0, abs=1e-9)
    # compliment golden: set_ops.ref:113
    assert compliment_estimate(a, series_int(100)) == pytest.approx(9898.4008858409, rel=1e-9)


def test_serialization_roundtrip():
    for n in (0, 1, 100, 1020, 1021, 10000):
        h = HLL.create()
        if n:
            h.add_hashes(hash_int32(np.arange(1, n + 1, dtype=np.int32)))
        back = HLL.from_bytes(h.to_bytes())
        assert back.is_sparse == h.is_sparse
        assert back.estimate() == h.estimate()
        assert back.equals(h)


def test_sparse_length_transition():
    # compression.sql:4-28 behavioral analogue: representation flips at 1020→1021
    assert series_int(1020).is_sparse
    assert not series_int(1021).is_sparse
    # serialized sparse payload = 8 header + 4*n
    assert series_int(100).serialized_size() == 8 + 400


def test_error_envelope_across_precisions():
    # BASELINE.md: estimate within 1.04/sqrt(2^b) (3σ margin) vs exact, b sweep
    rng = np.random.RandomState(42)
    vals = rng.randint(-(2**31), 2**31, size=50000).astype(np.int32)
    exact = len(np.unique(vals))
    for b in range(4, 19):
        h = HLL.create(b=b, binbits=6)
        h.add_hashes(hash_int32(vals))
        err = abs(h.estimate() - exact) / exact
        bound = 1.04 / math.sqrt(2**b)
        assert err <= 3 * bound, (b, err, bound)
