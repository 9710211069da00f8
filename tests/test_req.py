"""REQ sketch: HRA relative-error contract + merge + LRA mirror."""

from __future__ import annotations

import numpy as np
import pytest

from raydedup.sketches.req import ReqSketch


def _rank_err(sk, s, r):
    q = sk.quantile(r)
    side = "right"
    return abs(np.searchsorted(s, q, side=side) / len(s) - r)


def test_hra_accuracy_concentrates_at_high_ranks():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal(300_000)
    sk = ReqSketch(k=12, hra=True)
    for chunk in np.array_split(vals, 10):
        sk.update_many(chunk)
    s = np.sort(vals)
    assert _rank_err(sk, s, 0.999) < 0.0005
    assert _rank_err(sk, s, 0.99) < 0.002
    assert _rank_err(sk, s, 0.5) < 0.02
    # bounded space
    assert sk.num_retained < 10_000
    assert sk.n == 300_000


def test_lra_mirrors():
    rng = np.random.default_rng(2)
    vals = rng.standard_normal(200_000)
    sk = ReqSketch(k=12, hra=False)
    sk.update_many(vals)
    s = np.sort(vals)
    assert _rank_err(sk, s, 0.001) < 0.0005
    assert _rank_err(sk, s, 0.01) < 0.002


def test_merge_matches_contract():
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(200_000)
    a, b = ReqSketch(k=12), ReqSketch(k=12)
    a.update_many(vals[:100_000])
    b.update_many(vals[100_000:])
    a.merge(b)
    assert a.n == 200_000
    s = np.sort(vals)
    assert _rank_err(a, s, 0.99) < 0.003


def test_hra_lra_merge_rejected():
    with pytest.raises(ValueError):
        ReqSketch(hra=True).merge(ReqSketch(hra=False))


def test_min_max_and_edges():
    sk = ReqSketch()
    sk.update_many(np.arange(1000, dtype=np.float64))
    assert sk.quantile(0.0) == 0.0
    assert sk.quantile(1.0) == 999.0
