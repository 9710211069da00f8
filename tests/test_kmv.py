"""Theta/KMV sketch conformance — mirrors the reference's theta test
strategy: exact-mode identities, estimation-mode RSE bounds, set-op corner
cases, Jaccard bound ordering (T/theta/HeapUnionTest.java:59-464,
T/theta/JaccardSimilarityTest.java:77-140,
M/thetacommon/SetOperationCornerCases.java:37-122)."""

from __future__ import annotations

import numpy as np
import pytest

from raydedup import kmv
from raydedup.bounds import theta_rse
from raydedup.hashing import theta_hash_u64s
from raydedup.kmv import MAX_THETA, KmvSketch, build_sketch, empty_sketch


def _sketch_of_range(start: int, n: int, k: int) -> KmvSketch:
    h = theta_hash_u64s(np.arange(start, start + n, dtype=np.uint64))
    return build_sketch(h, k)


def test_exact_mode_is_exact():
    for n in [0, 1, 10, 4095, 4096]:
        sk = _sketch_of_range(0, n, 4096)
        assert sk.theta == MAX_THETA
        assert sk.estimate() == float(n)
        assert sk.lower_bound() == float(n) == sk.upper_bound()


def test_estimation_mode_within_rse():
    k, n = 4096, 1 << 20
    sk = _sketch_of_range(0, n, k)
    assert sk.is_estimation_mode
    rse = theta_rse(k)
    assert abs(sk.estimate() - n) / n < 3 * rse  # ±3σ ≈ 99.7%
    assert sk.lower_bound() <= sk.estimate() <= sk.upper_bound()
    assert sk.lower_bound() <= n <= sk.upper_bound()


def test_union_disjoint_exact_equals_sum():
    # HeapUnionTest.java:59: union of disjoint exact sketches = sum
    a = _sketch_of_range(0, 1000, 4096)
    b = _sketch_of_range(1_000_000, 1500, 4096)
    u = kmv.union(a, b)
    assert u.estimate() == 2500.0


def test_union_estimation_within_tolerance():
    # HeapUnionTest.java:404: estimation-mode union within ±5% of truth
    k = 4096
    a = _sketch_of_range(0, 1 << 20, k)
    b = _sketch_of_range(1 << 19, 1 << 20, k)  # 50% overlap
    u = kmv.union(a, b)
    truth = (1 << 20) + (1 << 19)
    assert abs(u.estimate() - truth) / truth < 0.05


def test_intersection_and_anotb():
    k = 4096
    a = _sketch_of_range(0, 2000, k)
    b = _sketch_of_range(1000, 2000, k)  # overlap = 1000
    inter = kmv.intersection(a, b)
    diff = kmv.a_not_b(a, b)
    assert inter.estimate() == 1000.0
    assert diff.estimate() == 1000.0


def test_corner_cases():
    # SetOperationCornerCases truth tables: empty/exact combinations
    k = 256
    e = empty_sketch(k)
    x = _sketch_of_range(0, 100, k)
    assert kmv.union(e, e).estimate() == 0.0
    assert kmv.union(e, x).estimate() == 100.0
    assert kmv.intersection(e, x).estimate() == 0.0
    assert kmv.a_not_b(x, e).estimate() == 100.0
    assert kmv.a_not_b(e, x).estimate() == 0.0


def test_jaccard_bounds_and_test():
    k = 4096
    a = _sketch_of_range(0, 10000, k)
    b = _sketch_of_range(2000, 10000, k)  # |A∩B|=8000, |A∪B|=12000, J=2/3
    lb, est, ub = kmv.jaccard(a, b)
    assert lb <= est <= ub
    assert abs(est - 2 / 3) < 0.05
    assert kmv.similarity_test(a, b, 0.5)
    assert not kmv.similarity_test(a, b, 0.8)


def test_jaccard_identical_and_disjoint():
    k = 256
    a = _sketch_of_range(0, 100, k)
    assert kmv.jaccard(a, a) == (1.0, 1.0, 1.0)
    b = _sketch_of_range(10**6, 100, k)
    lb, est, ub = kmv.jaccard(a, b)
    assert est == 0.0


def test_jaccard_k_entries_differ_by_one():
    # JaccardSimilarityTest.java:100-106 sensitivity analog
    k = 4096
    h = theta_hash_u64s(np.arange(k, dtype=np.uint64))
    a = build_sketch(h, k)
    h2 = theta_hash_u64s(np.concatenate([np.arange(k - 1), [10**9]]).astype(np.uint64))
    b = build_sketch(h2, k)
    lb, est, ub = kmv.jaccard(a, b)
    expected = (k - 1) / (k + 1)
    assert est < 1.0  # the single differing entry must be detectable
    assert abs(est - expected) < 1e-3
    assert not kmv.similarity_test(a, b, 1.0)


def test_order_insensitivity():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**62, size=5000, dtype=np.uint64)
    h = theta_hash_u64s(vals)
    a = build_sketch(h, 512)
    b = build_sketch(h[::-1].copy(), 512)
    assert a.theta == b.theta
    assert np.array_equal(a.hashes, b.hashes)


def test_merge_associativity():
    k = 512
    parts = [_sketch_of_range(i * 3000, 4000, k) for i in range(4)]
    left = kmv.union(kmv.union(parts[0], parts[1]), kmv.union(parts[2], parts[3]))
    seq = parts[0]
    for p in parts[1:]:
        seq = kmv.union(seq, p)
    assert left.theta == seq.theta
    assert np.array_equal(left.hashes, seq.hashes)


def test_serde_roundtrip():
    sk = _sketch_of_range(0, 100000, 1024)
    rt = KmvSketch.deserialize(sk.serialize())
    assert rt.k == sk.k and rt.theta == sk.theta
    assert np.array_equal(rt.hashes, sk.hashes)


def test_theta_domain_rejects_zero():
    h = kmv.to_theta_domain(np.array([0, 1, 2**63, 12345], dtype=np.uint64))
    assert np.uint64(0) not in h
    assert (h < MAX_THETA).all()


def test_build_sketch_sampling_p():
    import pytest

    from raydedup.config import SketchesArgumentError
    from raydedup.kmv import MAX_THETA, build_sketch, union

    rng = np.random.default_rng(42)
    h = rng.integers(1, 1 << 63, size=200_000, dtype=np.int64).astype(np.uint64)
    # p < 1: theta starts at p*2^63, estimate stays unbiased
    sk = build_sketch(h, k=1 << 20, p=0.25)
    assert sk.theta == np.uint64(int(0.25 * float(MAX_THETA)))
    assert (sk.hashes < sk.theta).all()
    assert abs(sk.estimate() / 200_000 - 1.0) < 0.02
    # p-sampled sketches stay mergeable under the min-theta rule
    sk2 = build_sketch(h[:100_000], k=1 << 20, p=0.5)
    u = union(sk, sk2, k=1 << 20)
    assert u.theta == sk.theta
    assert abs(u.estimate() / 200_000 - 1.0) < 0.02
    # p == 1 unchanged: exact below k
    exact = build_sketch(h[:100], k=4096, p=1.0)
    assert exact.theta == MAX_THETA and exact.estimate() == len(np.unique(h[:100]))
    with pytest.raises(SketchesArgumentError):
        build_sketch(h, k=16, p=0.0)


def test_sketch_warehouse_pairwise_overlap_exact_regime(ray_session):
    """The repo_overlap_matrix shape: per-group serialized sketches from
    ONE aggregate pass, pairwise intersection at query time — exact in
    the k >> |set| regime."""
    import pyarrow as pa
    import ray.data

    from raydedup.aggregates import theta_sketch_agg
    from raydedup.kmv import KmvSketch, intersection

    groups = {
        "g0": [f"d{i}" for i in range(40)],
        "g1": [f"d{i}" for i in range(20, 50)],  # |∩ g0| = 20
        "g2": [f"x{i}" for i in range(10)],  # disjoint
    }
    rows_g, rows_v = [], []
    for g, vals in groups.items():
        rows_g += [g] * len(vals)
        rows_v += vals
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(rows_g), "v": pa.array(rows_v)})
    )
    agg = ds.groupby("g").aggregate(theta_sketch_agg("v", k=4096, name="sk"))
    sk = {r["g"]: KmvSketch.deserialize(r["sk"]) for r in agg.take_all()}
    assert round(intersection(sk["g0"], sk["g1"]).estimate()) == 20
    assert round(intersection(sk["g0"], sk["g2"]).estimate()) == 0
    assert round(sk["g0"].estimate()) == 40
