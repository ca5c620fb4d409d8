"""Merge algebra properties (BASELINE.md merge-determinism target).

The distributed-aggregation contract requires the combine step to be
associative, commutative and idempotent so partial sketches from ANY
partition order yield byte-identical final registers (north_rule; the
reference's prefunc contract, sql/greenplum.sql:289-295).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hllspark.core.hash import hash_int64
from hllspark.core.hll import HLL


def build(vals: np.ndarray, b: int = 14) -> HLL:
    h = HLL.create(b=b, binbits=6)
    h.add_hashes(hash_int64(vals))
    return h


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=3000),
    nparts=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    b=st.sampled_from([4, 8, 14]),
)
def test_partition_order_invariance(data, nparts, seed, b):
    vals = np.array(data, dtype=np.int64)
    direct = build(vals, b)

    rng = np.random.RandomState(seed)
    assignment = rng.randint(0, nparts, size=len(vals))
    partials = [build(vals[assignment == p], b) for p in range(nparts)]
    order = rng.permutation(nparts)

    merged = HLL.create(b=b, binbits=6)
    for p in order:
        merged.merge(partials[p])

    # byte-identical registers, not merely equal estimates
    assert np.array_equal(merged.registers(), direct.registers())
    assert merged.to_bytes() == direct.to_bytes() or merged.is_sparse != direct.is_sparse
    assert merged.estimate() == direct.estimate()


def test_merge_idempotent():
    a = build(np.arange(5000, dtype=np.int64))
    twice = a.copy().merge(a)
    assert np.array_equal(twice.registers(), a.registers())
    assert twice.estimate() == a.estimate()


def test_merge_commutative_associative_bytes():
    xs = [np.arange(i * 700, i * 700 + 900, dtype=np.int64) for i in range(3)]
    a, b, c = (build(x) for x in xs)
    ab_c = a.copy().merge(b).merge(c)
    c_ba = c.copy().merge(b).merge(a)
    bc_a = b.copy().merge(c).merge(a)
    assert ab_c.to_bytes() == c_ba.to_bytes() == bc_a.to_bytes()


def test_merge_null_like_empty():
    # NULL contract analogue: merging an empty counter is the identity
    # (hyperloglog_counter.c:633-645)
    a = build(np.arange(2000, dtype=np.int64))
    empty = HLL.create()
    assert a.copy().merge(empty).to_bytes() == a.to_bytes()
    assert empty.copy().merge(a).estimate() == a.estimate()


def test_merge_parameter_mismatch_raises():
    a = HLL.create(b=14, binbits=6)
    b = HLL.create(b=12, binbits=6)
    with pytest.raises(ValueError):
        a.merge(b)
