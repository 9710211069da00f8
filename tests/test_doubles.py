"""Classic quantiles DoublesSketch: golden-file wire conformance + contracts.

The golden ``Qk128_n{50,1000}_v0.*.sk`` images are the reference's own
forward-compatibility resources (src/test/resources); the expected medians
come from its ForwardCompatibilityTest.java:32-110 (EXCLUSIVE rank 0.5 →
26 for n=50, 501 for n=1000, values 1..n).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
import pytest

from raydedup.sketches.doubles import DoublesSketch, normalized_rank_error

RES = Path("/root/reference/src/test/resources")

GOLDEN = [
    ("Qk128_n50_v0.3.0.sk", 50, 26.0),
    ("Qk128_n1000_v0.3.0.sk", 1000, 501.0),
    ("Qk128_n50_v0.6.0.sk", 50, 26.0),
    ("Qk128_n1000_v0.6.0.sk", 1000, 501.0),
    ("Qk128_n50_v0.8.0.sk", 50, 26.0),
    ("Qk128_n1000_v0.8.0.sk", 1000, 501.0),
    ("Qk128_n50_v0.8.3.sk", 50, 26.0),
    ("Qk128_n1000_v0.8.3.sk", 1000, 501.0),
]


class TestGoldenImages:
    @pytest.mark.parametrize("fname,n,median", GOLDEN)
    def test_heapify_golden(self, fname, n, median):
        sk = DoublesSketch.deserialize((RES / fname).read_bytes())
        assert sk.k == 128
        assert sk.n == n
        assert sk.min_item() == 1.0
        assert sk.max_item() == float(n)
        assert sk.quantile(0.5, inclusive=False) == median

    def test_golden_roundtrip_server3(self):
        """Re-serializing a heapified golden image in our SerVer-3 compact
        writer and re-reading it must preserve the sorted view exactly."""
        for fname, n, median in GOLDEN:
            sk = DoublesSketch.deserialize((RES / fname).read_bytes())
            rt = DoublesSketch.deserialize(sk.serialize())
            assert rt.n == sk.n and rt.k == sk.k
            assert rt.quantile(0.5, inclusive=False) == median
            a_it, a_cum = sk._sorted_view()
            b_it, b_cum = rt._sorted_view()
            assert np.array_equal(a_it, b_it) and np.array_equal(a_cum, b_cum)


class TestDoublesSketch:
    def test_exact_regime(self):
        sk = DoublesSketch(k=128)
        vals = np.arange(1.0, 201.0)
        sk.update_many(np.random.default_rng(1).permutation(vals))
        assert not sk.is_estimation_mode()
        assert sk.quantile(0.5, inclusive=False) == 101.0  # floor(.5*200)=100, first cum>100
        assert sk.quantile(0.5, inclusive=True) == 100.0
        assert sk.min_item() == 1.0 and sk.max_item() == 200.0
        assert sk.rank(100.0, inclusive=True) == 0.5

    def test_bit_pattern_invariant(self):
        sk = DoublesSketch(k=16)
        rng = np.random.default_rng(2)
        for chunk in np.array_split(rng.normal(size=10_000), 23):
            sk.update_many(chunk)
            assert sk.bit_pattern == sk.n // (2 * sk.k)
        assert sk.num_retained() == (sk.n % (2 * sk.k)) + bin(sk.bit_pattern).count("1") * sk.k

    def test_rank_error_contract(self):
        """k=128 → 1.725% normalized rank error (DoublesSketch.java:53-64);
        assert measured error within 3x the bound over trials."""
        k, n = 128, 50_000
        # the 1.725% @ k=128 figure in the reference table is the PMF
        # (double-sided) bound; single-sided is ~1.41%
        assert 0.017 < normalized_rank_error(k, pmf=True) < 0.018
        bound = normalized_rank_error(k)
        assert 0.013 < bound < 0.015
        rng = np.random.default_rng(3)
        worst = 0.0
        for t in range(5):
            sk = DoublesSketch(k=k, seed=t)
            sk.update_many(rng.permutation(np.arange(n, dtype=np.float64)))
            for r in (0.1, 0.25, 0.5, 0.75, 0.9):
                est = sk.quantile(r)
                worst = max(worst, abs(est / n - r))
        assert worst < 3 * bound, worst

    def test_merge_equal_k(self):
        rng = np.random.default_rng(4)
        a, b = DoublesSketch(k=64, seed=1), DoublesSketch(k=64, seed=2)
        va, vb = rng.normal(size=5000), rng.normal(size=7000)
        a.update_many(va)
        b.update_many(vb)
        a.merge(b)
        assert a.n == 12_000
        assert a.bit_pattern == a.n // 128
        allv = np.sort(np.concatenate([va, vb]))
        med = a.quantile(0.5)
        true_rank = np.searchsorted(allv, med) / len(allv)
        assert abs(true_rank - 0.5) < 3 * normalized_rank_error(64)

    def test_merge_downsampling(self):
        rng = np.random.default_rng(5)
        src, tgt = DoublesSketch(k=256, seed=1), DoublesSketch(k=64, seed=2)
        src.update_many(rng.normal(size=9000))
        tgt.update_many(rng.normal(size=3000))
        tgt.merge(src)
        assert tgt.n == 12_000
        assert tgt.bit_pattern == tgt.n // 128

    def test_merge_smaller_k_rejected(self):
        from raydedup.config import SketchesArgumentError

        src, tgt = DoublesSketch(k=64), DoublesSketch(k=128)
        src.update(1.0)
        with pytest.raises(SketchesArgumentError):
            tgt.merge(src)

    def test_empty_and_nan(self):
        sk = DoublesSketch(k=32)
        assert sk.is_empty() and math.isnan(sk.quantile(0.5))
        sk.update_many(np.array([math.nan]))
        assert sk.is_empty()
        rt = DoublesSketch.deserialize(sk.serialize())
        assert rt.is_empty() and rt.k == 32

    def test_serde_estimation_mode(self):
        sk = DoublesSketch(k=32, seed=7)
        sk.update_many(np.random.default_rng(6).normal(size=4321))
        rt = DoublesSketch.deserialize(sk.serialize())
        assert rt.n == sk.n and rt.bit_pattern == sk.bit_pattern
        a_it, a_cum = sk._sorted_view()
        b_it, b_cum = rt._sorted_view()
        assert np.array_equal(a_it, b_it) and np.array_equal(a_cum, b_cum)


def test_doubles_aggregate(ray_session):
    import ray.data

    from raydedup.aggregates import doubles_quantile

    n = 4000
    rng = np.random.default_rng(8)
    vals = rng.permutation(np.arange(1.0, n + 1.0))
    ds = ray.data.from_items([{"x": float(v)} for v in vals]).repartition(8)
    res = ds.aggregate(doubles_quantile("x", [0.25, 0.5, 0.9], k=4096, name="q"))
    # k=4096 → 2k=8192 > n: exact regime even after partial merges
    assert res["q"] == [
        float(math.ceil(r * n)) for r in (0.25, 0.5, 0.9)
    ]
