"""Property-based tests (hypothesis) — the engine analog of the reference's
randomized validation harnesses (M/cpc/StreamingValidation.java style)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raydedup import kmv
from raydedup.hashing import theta_hash_u64s, xxh64_bytes_many
from tests.reference_impls import xxh64 as ref_xxh64

SMALL = settings(max_examples=25, deadline=None)


@SMALL
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
       st.integers(min_value=0, max_value=2**64 - 1))
def test_xxh64_vectorized_matches_scalar(items, seed):
    got = xxh64_bytes_many(items, seed=seed)
    assert [int(x) for x in got] == [ref_xxh64(b, seed) for b in items]


def _sk(vals, k=64):
    return kmv.build_sketch(theta_hash_u64s(np.array(vals, dtype=np.uint64)), k)


@SMALL
@given(st.lists(st.integers(min_value=1, max_value=10**9), min_size=0, max_size=500),
       st.lists(st.integers(min_value=1, max_value=10**9), min_size=0, max_size=500))
def test_union_commutative(a_vals, b_vals):
    a, b = _sk(a_vals), _sk(b_vals)
    u1, u2 = kmv.union(a, b), kmv.union(b, a)
    assert u1.theta == u2.theta
    assert np.array_equal(u1.hashes, u2.hashes)


@SMALL
@given(st.lists(st.integers(min_value=1, max_value=10**9), min_size=0, max_size=300))
def test_union_idempotent(vals):
    a = _sk(vals)
    u = kmv.union(a, a)
    assert u.theta == a.theta
    assert np.array_equal(u.hashes, a.hashes)


@SMALL
@given(st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=300))
def test_exact_mode_estimate_equals_truth(vals):
    distinct = len(set(vals))
    a = _sk(vals, k=512)
    if distinct <= 512:
        assert a.estimate() == float(distinct)


@SMALL
@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=2, max_size=300))
def test_jaccard_bounds_ordered_and_selfsim(vals):
    a = _sk(vals)
    lb, est, ub = kmv.jaccard(a, a)
    assert (lb, est, ub) == (1.0, 1.0, 1.0)
    b = _sk([v + 10**9 for v in vals])
    lb, est, ub = kmv.jaccard(a, b)
    assert lb <= est <= ub
