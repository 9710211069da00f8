"""CPC sketch contracts: streaming accuracy within the documented ICON RSE
(cpc/StreamingValidation.java:38 style trials vs CpcConfidence.java:35
iconErrorConstant = ln 2), merge semantics (MergingValidation.java style),
downsampling, serde, and small-range exactness."""

from __future__ import annotations

import numpy as np
import pytest

from raydedup.hashing import splitmix64
from raydedup.sketches.cpc import CpcSketch, cpc_union


def _hashes(n: int, salt: int = 0) -> np.ndarray:
    return splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(salt * 10**12))


class TestCpcStreaming:
    def test_rse_contract_over_trials(self):
        """StreamingValidation-style: across independent streams the mean
        relative error must be far below one RSE and the spread within the
        documented ln(2)/sqrt(k) family."""
        lg_k = 10
        rse = np.log(2.0) / np.sqrt(1 << lg_k)  # ≈ 2.17%
        for n in (2_000, 50_000):
            errs = []
            for t in range(24):
                sk = CpcSketch(lg_k)
                sk.update_hashes(_hashes(n, salt=t + 1))
                errs.append((sk.estimate() - n) / n)
            errs = np.asarray(errs)
            assert abs(errs.mean()) < 1.5 * rse / np.sqrt(len(errs)) * 4, (n, errs.mean())
            assert errs.std() < 2.0 * rse, (n, errs.std())
            assert np.abs(errs).max() < 4.0 * rse, (n, errs)

    def test_hip_rse_beats_icon(self):
        """StreamingValidation-style trials (CpcSketch.java:138-141 HIP
        preference; CpcConfidence.java:34-36 constants): across independent
        streams the HIP estimator's empirical RSE must sit in the
        0.589/sqrt(k) family — measurably below ICON's 0.693/sqrt(k)."""
        lg_k = 10
        k = 1 << lg_k
        hip_rse = np.sqrt(np.log(2.0) / 2.0) / np.sqrt(k)   # ≈ 1.84%
        icon_rse = np.log(2.0) / np.sqrt(k)                 # ≈ 2.17%
        n = 30_000
        hip_errs, icon_errs = [], []
        for t in range(150):
            sk = CpcSketch(lg_k)
            sk.update_hashes(_hashes(n, salt=100 + t))
            assert not sk.merge_flag  # never merged → HIP preferred
            hip_errs.append((sk.estimate() - n) / n)
            icon_errs.append((sk.icon_estimate() - n) / n)
        hip_sd = float(np.std(hip_errs))
        icon_sd = float(np.std(icon_errs))
        assert 0.75 * hip_rse < hip_sd < 1.25 * hip_rse, (hip_sd, hip_rse)
        assert hip_sd < icon_sd, (hip_sd, icon_sd)  # HIP strictly tighter
        assert abs(float(np.mean(hip_errs))) < 4 * hip_rse / np.sqrt(150)

    def test_hip_survives_engine_serde_chain(self):
        """The Ray aggregate round-trips state through serialize() between
        blocks; a chained build must equal one uninterrupted build exactly."""
        h = _hashes(12_000)
        whole = CpcSketch(11)
        whole.update_hashes(h)
        chained = CpcSketch(11)
        for part in np.array_split(h, 5):
            chained.update_hashes(part)
            chained = CpcSketch.deserialize(chained.serialize())
        assert not chained.merge_flag
        assert chained.estimate() == whole.estimate()
        assert chained.kxp == whole.kxp

    def test_small_range_near_exact(self):
        sk = CpcSketch(14)
        sk.update_hashes(_hashes(100))
        assert round(sk.estimate()) == 100

    def test_duplicates_ignored(self):
        sk = CpcSketch(11)
        h = _hashes(5_000)
        sk.update_hashes(np.tile(h, 4))
        one = CpcSketch(11)
        one.update_hashes(h)
        assert sk.estimate() == one.estimate()

    def test_bounds_bracket(self):
        n = 30_000
        sk = CpcSketch(11)
        sk.update_hashes(_hashes(n))
        assert sk.lower_bound(3) <= n <= sk.upper_bound(3)


class TestCpcUnion:
    def test_merge_equals_single_stream(self):
        a, b = CpcSketch(11), CpcSketch(11)
        a.update_hashes(_hashes(20_000))
        b.update_hashes(_hashes(20_000, salt=1))
        a.merge(b)
        c = CpcSketch(11)
        c.update_hashes(np.concatenate([_hashes(20_000), _hashes(20_000, salt=1)]))
        # identical coupon matrices → identical ICON estimates; the merged
        # sketch is ICON while the single stream prefers HIP (reference
        # getEstimate rule), so compare on the ICON surface
        assert np.array_equal(a.matrix, c.matrix)
        assert a.estimate() == c.icon_estimate()

    def test_overlap_no_double_count(self):
        h = _hashes(25_000)
        a, b = CpcSketch(11), CpcSketch(11)
        a.update_hashes(h)
        b.update_hashes(h)
        a.merge(b)
        est = a.estimate()
        assert abs(est - 25_000) / 25_000 < 4 * a.rse

    def test_mixed_lgk_downsample_exact(self):
        h = _hashes(40_000)
        big = CpcSketch(13)
        big.update_hashes(h)
        small = CpcSketch(10)
        small.merge(big)
        direct = CpcSketch(10)
        direct.update_hashes(h)
        assert np.array_equal(small.matrix, direct.matrix)

    def test_union_many(self):
        parts = []
        for t in range(5):
            sk = CpcSketch(11)
            sk.update_hashes(_hashes(8_000, salt=t))
            parts.append(sk)
        u = cpc_union(parts)
        assert abs(u.estimate() - 40_000) / 40_000 < 4 * u.rse


class TestCpcSerde:
    def test_roundtrip(self):
        sk = CpcSketch(12)
        sk.update_hashes(_hashes(7_777))
        rt = CpcSketch.deserialize(sk.serialize())
        assert rt.lg_k == 12
        assert np.array_equal(rt.matrix, sk.matrix)
        assert rt.estimate() == sk.estimate()


def test_cpc_aggregate_groupby(ray_session):
    import pyarrow as pa
    import ray.data

    from raydedup.aggregates import cpc_distinct

    rng = np.random.default_rng(9)
    n = 20_000
    tbl = pa.table(
        {
            "g": pa.array(rng.integers(0, 4, n), pa.int64()),
            "v": pa.array(rng.integers(0, 800, n), pa.int64()),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .groupby("g")
        .aggregate(cpc_distinct("v", lg_k=12, name="d"))
        .to_pandas()
    )
    assert len(out) == 4
    for _, row in out.iterrows():
        # ~800 distinct per group, k=4096 → estimate rounds to exact ±1%
        assert abs(row["d"] - 800) / 800 < 0.02
