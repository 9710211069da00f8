"""Cardinality / quantile / frequency / sampling sketch contracts
(cross-estimator consistency in the spirit of T/hll/CrossCountingTest.java:
33-45; error contracts per BASELINE.md)."""

from __future__ import annotations

import numpy as np
import pytest

from raydedup.hashing import splitmix64
from raydedup.sketches.freq import NO_FALSE_NEGATIVES, FrequentKeysSketch
from raydedup.sketches.hll import HllSketch
from raydedup.sketches.kll import KllSketch
from raydedup.sketches.sampling import PrioritySample, ReservoirSketch
from raydedup.sketches.tuple import TupleSketch


def _hashes(n: int, salt: int = 0) -> np.ndarray:
    return splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(salt * 10**12))


class TestHll:
    def test_estimate_within_rse(self):
        for n in [100, 10_000, 1_000_000]:
            sk = HllSketch(lg_k=12)
            sk.update_hashes(_hashes(n))
            err = abs(sk.estimate() - n) / n
            assert err <= 3.5 * sk.rse, (n, sk.estimate())  # sparse: exact, rse 0

    def test_merge_equals_single_stream(self):
        a, b = HllSketch(12), HllSketch(12)
        a.update_hashes(_hashes(50_000))
        b.update_hashes(_hashes(50_000, salt=1))
        a.merge(b)
        c = HllSketch(12)
        c.update_hashes(np.concatenate([_hashes(50_000), _hashes(50_000, salt=1)]))
        # merged register state is identical to the single-stream build; the
        # ESTIMATES legitimately differ (merged = out-of-order -> composite,
        # never-merged -> HIP, like the reference's Union-vs-sketch results)
        np.testing.assert_array_equal(a.regs, c.regs)
        c_ooo = HllSketch(12)
        c_ooo.sparse, c_ooo.regs, c_ooo.out_of_order = None, c.regs.copy(), True
        assert a.estimate() == c_ooo.estimate()
        assert a.estimate() == pytest.approx(c.estimate(), rel=4 * a.rse)

    def test_merge_mixed_k_downsamples(self):
        a, b = HllSketch(10), HllSketch(12)
        a.update_hashes(_hashes(10_000))
        b.update_hashes(_hashes(10_000, salt=2))
        a.merge(b)
        assert a.lg_k == 10
        assert abs(a.estimate() - 20_000) / 20_000 < 3.5 * a.rse

    def test_serde(self):
        sk = HllSketch(11)
        sk.update_hashes(_hashes(1000))
        rt = HllSketch.deserialize(sk.serialize())
        assert rt.estimate() == sk.estimate()


class TestKll:
    def test_exact_when_under_capacity(self):
        rng = np.random.default_rng(1)
        vals = rng.standard_normal(150)
        sk = KllSketch(k=200)
        sk.update_many(vals)
        s = np.sort(vals)
        assert sk.quantile(0.5) == s[int(np.floor((len(s) - 1) * 0.5))]
        assert sk.min_value == s[0] and sk.max_value == s[-1]

    def test_rank_error_contract(self):
        # k=200 → ~1.65% @99%; assert 3% on one stream
        rng = np.random.default_rng(2)
        vals = rng.standard_normal(200_000)
        sk = KllSketch(k=200)
        sk.update_many(vals)
        s = np.sort(vals)
        for r in [0.1, 0.25, 0.5, 0.75, 0.9]:
            q = sk.quantile(r)
            true_rank = np.searchsorted(s, q, side="right") / len(s)
            assert abs(true_rank - r) < 0.03, (r, true_rank)

    def test_merge_matches_contract(self):
        rng = np.random.default_rng(3)
        a_vals = rng.standard_normal(100_000)
        b_vals = rng.standard_normal(100_000) + 0.5
        a, b = KllSketch(200), KllSketch(200)
        a.update_many(a_vals)
        b.update_many(b_vals)
        a.merge(b)
        s = np.sort(np.concatenate([a_vals, b_vals]))
        assert a.n == 200_000
        for r in [0.25, 0.5, 0.75]:
            q = a.quantile(r)
            true_rank = np.searchsorted(s, q, side="right") / len(s)
            assert abs(true_rank - r) < 0.04

    def test_pmf_cdf(self):
        sk = KllSketch(k=200)
        sk.update_many(np.arange(1000, dtype=np.float64))
        cdf = sk.cdf([250.0, 500.0, 750.0])
        assert cdf[-1] == 1.0
        assert abs(cdf[1] - 0.5) < 0.03
        pmf = sk.pmf([250.0, 500.0, 750.0])
        assert abs(sum(pmf) - 1.0) < 1e-9

    def test_serde(self):
        sk = KllSketch(k=200)
        sk.update_many(np.random.default_rng(4).standard_normal(5000))
        rt = KllSketch.deserialize(sk.serialize())
        assert rt.n == sk.n
        assert rt.quantile(0.5) == sk.quantile(0.5)


class TestFrequentKeys:
    def test_exact_when_under_capacity(self):
        sk = FrequentKeysSketch(64)
        keys = np.repeat(np.arange(10), [100, 90, 80, 70, 60, 5, 4, 3, 2, 1])
        sk.update_many(keys)
        assert sk.get_estimate(0) == 100
        assert sk.maximum_error == 0

    def test_no_false_negatives_under_purge(self):
        rng = np.random.default_rng(5)
        # zipf-ish stream: key i appears ~ n/i times
        keys = np.concatenate([np.full(5000 // (i + 1), i) for i in range(500)])
        rng.shuffle(keys)
        sk = FrequentKeysSketch(64)
        for chunk in np.array_split(keys, 7):
            sk.update_many(chunk)
        true_counts = {i: 5000 // (i + 1) for i in range(500)}
        thr = 500
        found = {k for k, _ in sk.get_frequent_items(thr, NO_FALSE_NEGATIVES)}
        for k, c in true_counts.items():
            if c > thr + sk.maximum_error:
                assert k in found, (k, c)

    def test_merge(self):
        a, b = FrequentKeysSketch(256), FrequentKeysSketch(256)
        a.update_many(np.repeat([1, 2], [50, 10]))
        b.update_many(np.repeat([1, 3], [30, 20]))
        a.merge(b)
        assert a.get_estimate(1) >= 80
        assert a.stream_len == 110

    def test_serde(self):
        sk = FrequentKeysSketch(32)
        sk.update_many(np.repeat([7, 8], [5, 3]))
        rt = FrequentKeysSketch.deserialize(sk.serialize())
        assert rt.get_estimate(7) == 5 and rt.stream_len == 8

    def test_many_partial_merges_offset_bounded(self):
        # regression: purging with raw (offset-laden) values grew the offset
        # exponentially across hundreds of partial merges → int overflow
        rng = np.random.default_rng(9)
        merged = FrequentKeysSketch(256)
        total = 0
        for _ in range(400):
            part = FrequentKeysSketch(256)
            keys = rng.integers(0, 100_000, size=2000)
            part.update_many(keys)
            total += 2000
            merged.merge(part)
        assert merged.stream_len == total
        assert merged.maximum_error <= total  # offset stays linear
        merged.serialize()  # must not overflow int64


class TestSampling:
    def test_reservoir_size_and_count(self):
        sk = ReservoirSketch(32, seed=1)
        sk.update_many(list(range(1000)))
        assert len(sk.samples) == 32
        assert sk.n == 1000
        assert all(0 <= s < 1000 for s in sk.samples)

    def test_reservoir_merge(self):
        a, b = ReservoirSketch(16, seed=1), ReservoirSketch(16, seed=2)
        a.update_many(list(range(100)))
        b.update_many(list(range(100, 300)))
        a.merge(b)
        assert a.n == 300
        assert len(a.samples) == 16

    def test_priority_subset_sum_unbiased(self):
        rng = np.random.default_rng(6)
        weights = rng.exponential(1.0, size=2000)
        keys = np.arange(2000, dtype=np.int64)
        true_even = weights[keys % 2 == 0].sum()
        ests = []
        for trial in range(30):
            sk = PrioritySample(256, seed=trial)
            sk.update_many(keys, weights)
            s = sk.estimate_subset_sum(lambda k: k % 2 == 0)
            ests.append(s.estimate)
            assert s.total_sketch_weight == pytest.approx(weights.sum())
        mean_est = np.mean(ests)
        assert abs(mean_est - true_even) / true_even < 0.1

    def test_priority_merge_dedups_keys(self):
        keys = np.arange(100, dtype=np.int64)
        w = np.ones(100)
        a, b = PrioritySample(64, seed=0), PrioritySample(64, seed=0)
        a.update_many(keys[:70], w[:70])
        b.update_many(keys[30:], w[30:])
        a.merge(b)
        assert len(np.unique(a.keys)) == len(a.keys)


class TestTuple:
    def _hashes(self, lo, n):
        from raydedup.hashing import theta_hash_u64s

        return theta_hash_u64s(np.arange(lo, lo + n, dtype=np.uint64))

    def test_update_sum_mode(self):
        sk = TupleSketch.empty(k=256, num_values=1, mode="sum")
        h = self._hashes(0, 100)
        sk = sk.update_many(h, np.ones((100, 1)))
        sk = sk.update_many(h[:50], np.ones((50, 1)))
        assert sk.estimate() == 100.0
        assert sk.values.sum() == 150.0

    def test_union_intersect_anotb(self):
        a = TupleSketch.empty(256, 1, "sum").update_many(
            self._hashes(0, 100), np.ones((100, 1))
        )
        b = TupleSketch.empty(256, 1, "sum").update_many(
            self._hashes(50, 100), np.ones((100, 1))
        )
        u = a.union(b)
        assert u.estimate() == 150.0
        i = a.intersect(b)
        assert i.estimate() == 50.0
        assert (i.values == 2.0).all()  # sum combine of 1+1
        d = a.a_not_b(b)
        assert d.estimate() == 50.0

    def test_filter_preserves_theta(self):
        a = TupleSketch.empty(64, 1, "sum").update_many(
            self._hashes(0, 1000), np.arange(1000, dtype=np.float64)[:, None]
        )
        f = a.filter(lambda v: v[:, 0] > 100)
        assert f.theta == a.theta
        assert (f.values[:, 0] > 100).all()


class TestKllItems:
    def test_exact_under_capacity(self):
        from raydedup.sketches.kll_items import KllItemsSketch

        words = [f"w{i:05d}" for i in range(500)]
        rng = np.random.default_rng(0)
        shuf = list(words)
        rng.shuffle(shuf)
        sk = KllItemsSketch(k=600)
        sk.update_many(shuf)
        assert sk.quantile(0.5) == words[249]  # inclusive rank
        assert sk.min_value == words[0] and sk.max_value == words[-1]

    def test_sketched_rank_error(self):
        from raydedup.sketches.kll import KllSketch
        from raydedup.sketches.kll_items import KllItemsSketch

        n = 30_000
        words = [f"w{i:06d}" for i in range(n)]
        rng = np.random.default_rng(1)
        shuf = list(words)
        rng.shuffle(shuf)
        sk = KllItemsSketch(k=200)
        for i in range(0, n, 4096):
            sk.update_many(shuf[i : i + 4096])
        eps = KllSketch.normalized_rank_error(200)
        for r in (0.1, 0.5, 0.9):
            got = sk.quantile(r)
            true_rank = (int(got[1:]) + 1) / n
            assert abs(true_rank - r) < 3 * eps, (r, got)

    def test_merge_and_serde(self):
        from raydedup.sketches.kll_items import KllItemsSketch

        a, b = KllItemsSketch(k=100, seed=1), KllItemsSketch(k=100, seed=2)
        a.update_many([f"a{i:04d}" for i in range(5000)])
        b.update_many([f"b{i:04d}" for i in range(5000)])
        a.merge(b)
        assert a.n == 10_000
        rt = KllItemsSketch.deserialize(a.serialize())
        assert rt.quantiles([0.25, 0.75]) == a.quantiles([0.25, 0.75])
        # weight preservation
        got = sum(len(l) * (1 << i) for i, l in enumerate(rt.levels))
        assert got == rt.n

    def test_none_skipped(self):
        from raydedup.sketches.kll_items import KllItemsSketch

        sk = KllItemsSketch(k=50)
        sk.update_many(["x", None, "y", None])
        assert sk.n == 2


class TestFrequentItemsGeneric:
    def test_exact_small(self):
        from raydedup.sketches.freq import FrequentItemsSketch

        sk = FrequentItemsSketch(64)
        sk.update_many(["a"] * 50 + ["b"] * 30 + ["c"] * 5)
        assert sk.get_estimate("a") == 50
        assert sk.get_estimate("missing") == 0
        top = sk.get_frequent_items(10)
        assert top[0] == ("a", 50) and top[1] == ("b", 30)

    def test_mg_bound_and_merge(self):
        from raydedup.sketches.freq import FrequentItemsSketch

        rng = np.random.default_rng(2)
        zipf = rng.zipf(1.5, 30_000)
        items = [f"item{z}" for z in zipf]
        a, b = FrequentItemsSketch(256), FrequentItemsSketch(256)
        a.update_many(items[:15_000])
        b.update_many(items[15_000:])
        a.merge(b)
        from collections import Counter

        truth = Counter(items)
        for key, true_cnt in truth.most_common(10):
            est = a.get_estimate(key)
            assert true_cnt - a.maximum_error <= est
            assert est <= true_cnt + a.maximum_error

    def test_serde(self):
        from raydedup.sketches.freq import FrequentItemsSketch

        sk = FrequentItemsSketch(32)
        sk.update_many(["x"] * 9 + ["y"] * 4)
        rt = FrequentItemsSketch.deserialize(sk.serialize())
        assert rt.get_estimate("x") == 9 and rt.stream_len == 13


class TestTupleCompleteness:
    def test_increment_mode(self):
        from raydedup.hashing import theta_hash_u64s
        from raydedup.sketches.tuple import TupleSketch

        keys = np.array([1, 2, 1, 1, 2, 3], dtype=np.uint64)
        h = theta_hash_u64s(keys)
        sk = TupleSketch.empty(64, 1, "increment")
        sk = sk.update_many(h, np.ones((6, 1)))
        # key 1 observed 3x -> value 3; key 2 -> 2; key 3 -> 1
        vals = {int(k): float(v[0]) for k, v in zip(sk.hashes, sk.values)}
        hs = {int(x) for x in theta_hash_u64s(np.array([1, 2, 3], dtype=np.uint64))}
        assert set(vals) == hs
        assert sorted(vals.values()) == [1.0, 2.0, 3.0]

    def test_tuple_jaccard_exact_and_bounds(self):
        from raydedup.hashing import theta_hash_u64s
        from raydedup.sketches.tuple import TupleSketch, tuple_exactly_equal, tuple_jaccard

        ka = np.arange(0, 1000, dtype=np.uint64)
        kb = np.arange(500, 1500, dtype=np.uint64)
        a = TupleSketch.empty(1 << 14).update_many(theta_hash_u64s(ka), np.ones((1000, 1)))
        b = TupleSketch.empty(1 << 14).update_many(theta_hash_u64s(kb), np.ones((1000, 1)))
        lb, est, ub = tuple_jaccard(a, b)
        assert lb <= est <= ub
        assert abs(est - 500 / 1500) < 1e-12  # exact mode
        same = TupleSketch.empty(1 << 14).update_many(theta_hash_u64s(ka), np.ones((1000, 1)))
        assert tuple_jaccard(a, same) == (1.0, 1.0, 1.0)
        assert tuple_exactly_equal(a, same)
        assert not tuple_exactly_equal(a, b)

    def test_array_of_strings_sketch(self):
        from raydedup.hashing import theta_hash_u64s
        from raydedup.sketches.tuple import ArrayOfStringsSketch

        keys = np.array([10, 20, 10, 30], dtype=np.uint64)
        h = theta_hash_u64s(keys)
        sk = ArrayOfStringsSketch(k=64)
        sk.update_many(h, ["a", "b", "c", "d"])
        by_hash = dict(zip(sk.hashes.tolist(), sk.summaries))
        h10 = int(theta_hash_u64s(np.array([10], dtype=np.uint64))[0])
        assert by_hash[h10] == {"a", "c"}
        # union merges summaries by set union
        sk2 = ArrayOfStringsSketch(k=64)
        sk2.update_many(theta_hash_u64s(np.array([10], dtype=np.uint64)), ["z"])
        u = sk.union(sk2)
        by_hash = dict(zip(u.hashes.tolist(), u.summaries))
        assert by_hash[h10] == {"a", "c", "z"}
        assert u.estimate() == 3.0
        rt = ArrayOfStringsSketch.deserialize(u.serialize())
        assert rt.summaries == u.summaries

    def test_array_of_strings_trim(self):
        from raydedup.hashing import theta_hash_u64s
        from raydedup.sketches.tuple import ArrayOfStringsSketch

        keys = np.arange(1, 5001, dtype=np.uint64)
        sk = ArrayOfStringsSketch(k=256)
        sk.update_many(theta_hash_u64s(keys), [f"s{i}" for i in range(5000)])
        assert len(sk.hashes) == 256
        est = sk.estimate()
        assert abs(est - 5000) / 5000 < 0.2


class TestVarOpt:
    def test_exact_under_k(self):
        from raydedup.sketches.sampling import VarOptItemsSketch

        sk = VarOptItemsSketch(k=32, seed=1)
        for i in range(20):
            sk.update(i, float(i + 1))
        assert sk.num_samples == 20 and sk.r == 0
        s = sk.estimate_subset_sum(lambda key: key % 2 == 0)
        truth = sum(i + 1 for i in range(20) if i % 2 == 0)
        assert s.estimate == truth == s.lower_bound == s.upper_bound

    def test_invariants_and_heavy_region(self):
        from raydedup.sketches.sampling import VarOptItemsSketch

        rng = np.random.default_rng(2)
        sk = VarOptItemsSketch(k=64, seed=3)
        for i in range(5000):
            sk.update(i, float(rng.random() + 0.01))
        # plant giant items: must be retained exactly in H
        for g in range(5):
            sk.update(10_000 + g, 1e6 + g)
        assert sk.num_samples == 64
        tau = sk.tau()
        heavy = {key: w for w, _, key in sk._heap}
        for g in range(5):
            assert 10_000 + g in heavy
            assert heavy[10_000 + g] == 1e6 + g
        for w in heavy.values():
            assert w >= tau - 1e-9

    def test_subset_sum_unbiased(self):
        from raydedup.sketches.sampling import VarOptItemsSketch

        rng = np.random.default_rng(4)
        n = 3000
        weights = rng.random(n) + 0.05
        truth = float(weights[np.arange(n) % 3 == 0].sum())
        rels = []
        for seed in range(40):
            sk = VarOptItemsSketch(k=128, seed=seed)
            for i in range(n):
                sk.update(i, float(weights[i]))
            est = sk.estimate_subset_sum(lambda key: key % 3 == 0).estimate
            rels.append((est - truth) / truth)
        assert abs(float(np.mean(rels))) < 0.05, np.mean(rels)

    def test_total_weight_preserved(self):
        from raydedup.sketches.sampling import VarOptItemsSketch

        rng = np.random.default_rng(5)
        sk = VarOptItemsSketch(k=32, seed=6)
        tw = 0.0
        for i in range(2000):
            w = float(rng.random() + 0.01)
            tw += w
            sk.update(i, w)
        # retained adjusted weights sum to ~the true total (exactly, for
        # varopt: H exact + r * tau == total ... within float tolerance)
        kept = sum(w for _, w in sk.samples())
        assert abs(kept - tw) / tw < 1e-9
        assert sk.total_weight == tw

    def test_merge_unbiased(self):
        from raydedup.sketches.sampling import VarOptItemsSketch

        rng = np.random.default_rng(7)
        n = 2000
        weights = rng.random(n) + 0.05
        truth = float(weights[np.arange(n) % 2 == 0].sum())
        rels = []
        for seed in range(30):
            a = VarOptItemsSketch(k=96, seed=seed)
            b = VarOptItemsSketch(k=96, seed=seed + 1000)
            for i in range(n // 2):
                a.update(i, float(weights[i]))
            for i in range(n // 2, n):
                b.update(i, float(weights[i]))
            a.merge(b)
            assert a.n == n
            est = a.estimate_subset_sum(lambda key: key % 2 == 0).estimate
            rels.append((est - truth) / truth)
        assert abs(float(np.mean(rels))) < 0.08, np.mean(rels)


def test_varopt_aggregate(ray_session):
    import pickle

    import pyarrow as pa
    import ray.data

    from raydedup.aggregates import varopt_sample

    rng = np.random.default_rng(8)
    n = 10_000
    w = rng.random(n) + 0.05
    tbl = pa.table(
        {
            "key": pa.array(np.arange(n, dtype=np.int64)),
            "w": pa.array(w),
        }
    )
    res = ray.data.from_arrow(tbl).repartition(6).aggregate(
        varopt_sample("key", "w", k=256, name="vo")
    )
    sk = pickle.loads(res["vo"])
    assert sk.n == n
    assert abs(sk.total_weight - float(w.sum())) < 1e-6
    truth = float(w[np.arange(n) % 5 == 0].sum())
    s = sk.estimate_subset_sum(lambda key: key % 5 == 0)
    assert s.lower_bound <= truth * 1.35 and truth * 0.65 <= s.upper_bound


class TestHllSparseTier:
    def test_small_range_exact(self):
        from raydedup.sketches.hll import HllSketch

        sk = HllSketch(lg_k=14)
        sk.update_hashes(_hashes(300))
        assert sk.is_sparse
        assert sk.estimate() == 300.0  # exact, not linear-counting approx
        assert sk.rse == 0.0

    def test_promotion_and_continuity(self):
        from raydedup.sketches.hll import HllSketch

        sk = HllSketch(lg_k=12)
        sk.update_hashes(_hashes(100_000))
        assert not sk.is_sparse
        dense = HllSketch(12)
        dense.update_hashes(_hashes(100_000))
        assert sk.estimate() == dense.estimate()

    def test_sparse_serde_roundtrip(self):
        from raydedup.sketches.hll import HllSketch

        sk = HllSketch(lg_k=12)
        sk.update_hashes(_hashes(100))
        rt = HllSketch.deserialize(sk.serialize())
        assert rt.is_sparse and rt.estimate() == 100.0
        rt.update_hashes(_hashes(100, salt=3))
        assert rt.estimate() == 200.0

    def test_sparse_dense_merges(self):
        from raydedup.sketches.hll import HllSketch

        sp = HllSketch(12)
        sp.update_hashes(_hashes(200))
        dn = HllSketch(12)
        dn.update_hashes(_hashes(50_000, salt=1))
        # dense.merge(sparse): replay
        a = HllSketch.deserialize(dn.serialize())
        a.merge(sp)
        want = HllSketch(12)
        want.update_hashes(np.concatenate([_hashes(50_000, salt=1), _hashes(200)]))
        # register parity; estimates go through the out-of-order composite
        # path for merges vs HIP for the single stream (reference semantics)
        np.testing.assert_array_equal(a.regs, want.regs)
        want_ooo = HllSketch(12)
        want_ooo.sparse, want_ooo.out_of_order = None, True
        want_ooo.regs = want.regs.copy()
        assert a.estimate() == want_ooo.estimate()
        assert a.estimate() == pytest.approx(want.estimate(), rel=4 * a.rse)
        # sparse.merge(dense): adopt dense then replay own hashes
        b = HllSketch.deserialize(sp.serialize())
        b.merge(dn)
        np.testing.assert_array_equal(b.regs, want.regs)
        assert b.estimate() == want_ooo.estimate()
        # sparse.merge(sparse): stays exact while under the limit
        c = HllSketch(14)
        c.update_hashes(_hashes(100))
        d = HllSketch(14)
        d.update_hashes(_hashes(100, salt=2))
        c.merge(d)
        assert c.is_sparse and c.estimate() == 200.0
