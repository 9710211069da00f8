"""Regression tests for the round-1 ADVICE findings:

1. PrioritySample.merge must drop items whose priority <= merged tau
   (otherwise estimate_subset_sum deterministically overestimates).
2. ReqSketch.rse must be dimensionless in [0, 1].
3. HllSketch cross-lgK merge must be an EXACT downsample (index/rho from
   lgK-independent bit fields) — merging overlapping streams at different
   lg_k must not double-count.
4. KllSketch odd-level compaction must preserve total retained weight == n
   (leave one item behind); REQ shares the invariant.
5. manifest._shard_metrics must take the KMV cell width from config, not
   infer it from buffer length.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.hashing import splitmix64
from raydedup.sketches.hll import HllSketch
from raydedup.sketches.kll import KllSketch
from raydedup.sketches.req import ReqSketch
from raydedup.sketches.sampling import PrioritySample


def _hashes(n: int, salt: int = 0) -> np.ndarray:
    return splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(salt * 10**12))


class TestPrioritySampleMergeTau:
    def test_no_subthreshold_items_after_merge(self):
        a, b = PrioritySample(k=64, seed=1), PrioritySample(k=64, seed=1)
        rng = np.random.default_rng(0)
        a.update_many(np.arange(10_000, dtype=np.int64), rng.random(10_000) + 0.1)
        b.update_many(
            np.arange(10_000, 20_000, dtype=np.int64), rng.random(10_000) + 0.1
        )
        a.merge(b)
        assert a.tau > 0.0
        assert (a.priorities > a.tau).all()

    def test_subset_sum_unbiased_after_merge(self):
        # average estimate over independent seeds should be near the truth,
        # not deterministically above it
        rng = np.random.default_rng(7)
        n = 20_000
        keys = np.arange(n, dtype=np.int64)
        weights = rng.random(n) + 0.05
        truth = float(weights[keys % 2 == 0].sum())
        rel_errs = []
        for seed in range(12):
            a, b = PrioritySample(k=256, seed=seed), PrioritySample(k=256, seed=seed)
            a.update_many(keys[: n // 2], weights[: n // 2])
            b.update_many(keys[n // 2 :], weights[n // 2 :])
            a.merge(b)
            est = a.estimate_subset_sum(lambda k: k % 2 == 0).estimate
            rel_errs.append((est - truth) / truth)
        mean_rel = float(np.mean(rel_errs))
        # pre-fix this was a deterministic +overestimate; now ~unbiased
        assert abs(mean_rel) < 0.15, rel_errs


class TestReqRse:
    def test_rse_dimensionless(self):
        sk = ReqSketch(k=12, hra=True)
        sk.update_many(np.arange(100_000, dtype=np.float64))
        for r in [0.01, 0.5, 0.9, 0.99, 0.999]:
            v = sk.rse(r)
            assert 0.0 <= v <= 1.0, (r, v)
        # HRA: error shrinks toward rank 1
        assert sk.rse(0.99) < sk.rse(0.5)


class TestHllCrossLgK:
    def test_downsample_is_exact(self):
        # folding a lg12 sketch to lg10 must give the SAME registers as
        # building at lg10 directly from the same stream
        h = _hashes(50_000)
        big = HllSketch(12)
        big.update_hashes(h)
        small = HllSketch(10)
        small.merge(big)
        direct = HllSketch(10)
        direct.update_hashes(h)
        assert np.array_equal(small.regs, direct.regs)

    def test_overlapping_streams_mixed_k_no_double_count(self):
        # same 30k elements in both sketches at different lg_k: the union
        # must estimate ~30k, not ~60k
        h = _hashes(30_000)
        a, b = HllSketch(10), HllSketch(13)
        a.update_hashes(h)
        b.update_hashes(h)
        a.merge(b)
        est = a.estimate()
        assert abs(est - 30_000) / 30_000 < 3.5 * a.rse, est


class TestKllWeightPreservation:
    def _retained_weight(self, sk: KllSketch) -> int:
        return sum(len(lvl) * (1 << i) for i, lvl in enumerate(sk.levels))

    def test_weight_equals_n(self):
        rng = np.random.default_rng(3)
        sk = KllSketch(k=50)
        for _ in range(37):
            sk.update_many(rng.standard_normal(rng.integers(1, 500)))
        assert self._retained_weight(sk) == sk.n

    def test_weight_equals_n_after_merge(self):
        rng = np.random.default_rng(4)
        a, b = KllSketch(k=50, seed=1), KllSketch(k=50, seed=2)
        a.update_many(rng.standard_normal(10_000))
        b.update_many(rng.standard_normal(7_777))
        a.merge(b)
        assert self._retained_weight(a) == a.n

    def test_req_weight_equals_n(self):
        rng = np.random.default_rng(5)
        sk = ReqSketch(k=12)
        for _ in range(23):
            sk.update_many(rng.standard_normal(rng.integers(1, 1000)))
        got = sum(
            len(c.items) * (1 << h) for h, c in enumerate(sk.compactors)
        )
        assert got == sk.n


class TestShardMetricsCellWidth:
    def _tbl(self, cell_bytes: int) -> pa.Table:
        rng = np.random.default_rng(6)
        blobs = []
        for _ in range(10):
            # EVEN number of 4-byte cells → buffer length divisible by 8,
            # the case the old inference misparsed
            k = 16
            h = np.sort(rng.integers(0, 2**31, size=k, dtype=np.uint64))
            if cell_bytes == 4:
                blobs.append(h.astype("<u4").tobytes())
            else:
                blobs.append(h.astype("<u8").tobytes())
        return pa.table(
            {
                "n_tokens": pa.array([100] * 10, type=pa.int64()),
                "kmv": pa.array(blobs, type=pa.binary()),
            }
        )

    def test_u4_cells_parse_with_config_width(self):
        from raydedup.manifest import _shard_metrics

        m4 = _shard_metrics(self._tbl(4), kmv_hash_bytes=4)
        # 10 rows x 16 cells with distinct values → estimate in a sane range
        assert 50 <= m4["distinct_shingle_est"] <= 400

    def test_u8_default(self):
        from raydedup.manifest import _shard_metrics

        m8 = _shard_metrics(self._tbl(8), kmv_hash_bytes=8)
        assert 50 <= m8["distinct_shingle_est"] <= 400
