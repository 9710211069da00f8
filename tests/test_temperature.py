"""temperature_mix (raydedup/curate.py): integer threshold math vs a
Python brute force, modulo-mode exactness, hash-mode share flattening."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _brute_thr(counts: dict[str, int], tn: int, td: int, buckets: int):
    w = {s: math.floor(math.sqrt(float(n))) for s, n in counts.items() if n > 0}
    z, nn = sum(w.values()), sum(counts.values())
    return {
        s: min(buckets, (tn * nn * w[s] * buckets) // (td * z * counts[s]))
        for s in w
    }


def test_threshold_math():
    from raydedup.curate import temperature_thresholds

    counts = {"a": 10_000, "b": 100, "c": 1, "d": 0}
    thr = temperature_thresholds(counts, (1, 2), 1000)
    assert thr == _brute_thr(counts, 1, 2, 1000)
    assert "d" not in thr
    # flattening: the small stratum keeps a larger fraction than the big one
    assert thr["c"] == 1000  # clamped at keep-everything
    assert thr["b"] > thr["a"]
    import pytest

    with pytest.raises(ValueError):
        temperature_thresholds(counts, (3, 2))
    with pytest.raises(ValueError):
        temperature_thresholds({})


def test_temperature_mix_modulo_exact(ray_session):
    import ray.data

    from raydedup.curate import temperature_mix

    rng = np.random.default_rng(7)
    n = 3000
    src = np.where(rng.random(n) < 0.8, "big", np.where(rng.random(n) < 0.5, "mid", "small"))
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "source": pa.array(src.tolist())})
    counts = {s: int((src == s).sum()) for s in set(src.tolist())}
    thr = _brute_thr(counts, 1, 2, 1000)
    want = sorted(
        int(i) for i, s in zip(ids, src) if (i % 1000) < thr.get(s, 0)
    )
    ds = ray.data.from_arrow(tbl)
    got = sorted(
        temperature_mix(
            ds, key="source", id_col="doc_id", total_frac=(1, 2),
            method="modulo", buckets=1000,
        )
        .to_pandas()["doc_id"]
        .astype(int)
    )
    assert got == want


def test_temperature_mix_hash_flattens_shares(ray_session):
    import ray.data

    from raydedup.curate import temperature_mix

    rng = np.random.default_rng(11)
    n = 40_000
    src = np.where(rng.random(n) < 0.9, "huge", "tiny")  # 90/10 mix
    tbl = pa.table(
        {
            "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
            "source": pa.array(src.tolist()),
        }
    )
    out = temperature_mix(
        ray.data.from_arrow(tbl), key="source", id_col="doc_id",
        total_frac=(1, 2), method="hash",
    ).to_pandas()
    kept = out.groupby("source").size().to_dict()
    total = sum(kept.values())
    # target shares ∝ sqrt(counts): sqrt(.9)/ (sqrt(.9)+sqrt(.1)) ≈ 0.75
    share_huge = kept["huge"] / total
    assert 0.70 < share_huge < 0.80
    assert 0.4 < total / n < 0.6  # ~half the corpus kept
