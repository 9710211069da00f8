"""LSH band auto-tuner (raydedup/lshtune.py): analytic anchors, an
independent integration cross-check, and optimizer behavior."""

from __future__ import annotations

import numpy as np
import pytest

from raydedup.lshtune import (
    band_error_areas,
    collision_probability,
    optimal_band_config,
    threshold_at_half,
)


def test_collision_probability_analytic_anchors():
    # b=1, r=1: P(s) = s exactly
    s = np.linspace(0, 1, 11)
    assert np.allclose(collision_probability(s, 1, 1), s)
    # flagship config at s=0.5: 1 - (1 - 0.5^8)^16
    want = 1.0 - (1.0 - 0.5**8) ** 16
    assert collision_probability(0.5, 16, 8) == pytest.approx(want, rel=1e-12)
    # monotone in s, and extremes pin to 0/1
    p = collision_probability(np.linspace(0, 1, 101), 16, 8)
    assert (np.diff(p) >= -1e-15).all()
    assert p[0] == 0.0 and p[-1] == pytest.approx(1.0, abs=1e-12)


def test_threshold_at_half_flagship():
    # the north-star (b=16, r=8) S-curve midpoint is (1/16)^(1/8) ~ 0.707
    assert threshold_at_half(16, 8) == pytest.approx(2 ** -0.5, rel=1e-12)


def test_areas_match_independent_trapezoid():
    """Midpoint areas agree with an independently coded trapezoid rule."""
    for b, r, t in [(16, 8, 0.7), (4, 2, 0.3), (32, 4, 0.5), (1, 1, 0.85)]:
        fp, fn = band_error_areas(b, r, t, resolution=4000)
        s_lo = np.linspace(0.0, t, 20001)
        s_hi = np.linspace(t, 1.0, 20001)
        fp_ref = np.trapz(collision_probability(s_lo, b, r), s_lo)
        fn_ref = np.trapz(1.0 - collision_probability(s_hi, b, r), s_hi)
        assert fp == pytest.approx(fp_ref, abs=1e-5), (b, r, t)
        assert fn == pytest.approx(fn_ref, abs=1e-5), (b, r, t)


def test_optimizer_is_the_true_argmin():
    """The returned config minimizes the weighted score over the full
    candidate grid (recomputed here from the public probability alone)."""
    num_perm, t, wf, wn = 32, 0.6, 0.7, 0.3
    best = optimal_band_config(num_perm, t, fp_weight=wf, fn_weight=wn)
    scores = []
    for r in range(1, num_perm + 1):
        for b in range(1, num_perm // r + 1):
            s = np.linspace(0, 1, 40001)
            p = collision_probability(s, b, r)
            fp = np.trapz(p[s <= t], s[s <= t])
            fn = np.trapz(1 - p[s >= t], s[s >= t])
            scores.append((wf * fp + wn * fn, b, r))
    true_min = min(x[0] for x in scores)
    assert best.score == pytest.approx(true_min, abs=1e-4)


def test_optimal_r_tracks_threshold():
    """Higher target thresholds need steeper curves further right: the
    chosen midpoint (1/b)^(1/r) is non-decreasing in the threshold, and
    brackets each threshold reasonably."""
    mids = []
    for t in (0.3, 0.5, 0.7, 0.9):
        cfg = optimal_band_config(128, t)
        mid = threshold_at_half(cfg.bands, cfg.rows_per_band)
        mids.append(mid)
        assert abs(mid - t) < 0.25, (t, cfg)
    assert (np.diff(mids) >= -1e-9).all()


def test_flagship_config_is_near_optimal_at_its_midpoint():
    """At the flagship's own midpoint threshold (~0.707, num_perm=128) the
    pinned (16, 8) scores within 2x of the unconstrained optimum — the
    frozen default is a sane point on the curve, not an arbitrary one."""
    t = threshold_at_half(16, 8)
    best = optimal_band_config(128, t)
    fp, fn = band_error_areas(16, 8, t)
    assert 0.5 * fp + 0.5 * fn <= 2.0 * best.score


def test_fn_weight_lowers_r():
    """Weighting false negatives harder must not raise r (catch more)."""
    balanced = optimal_band_config(64, 0.7, fp_weight=0.5, fn_weight=0.5)
    recall_heavy = optimal_band_config(64, 0.7, fp_weight=0.05, fn_weight=0.95)
    assert recall_heavy.rows_per_band <= balanced.rows_per_band
    assert recall_heavy.fn_area <= balanced.fn_area + 1e-12


def test_validation():
    with pytest.raises(ValueError):
        optimal_band_config(0, 0.5)
    with pytest.raises(ValueError):
        optimal_band_config(16, 1.5)
    with pytest.raises(ValueError):
        optimal_band_config(16, 0.5, fp_weight=0.0, fn_weight=0.0)
    with pytest.raises(ValueError):
        collision_probability(0.5, 0, 4)
