"""Composite estimator for merged (out-of-order) HLL register state
(hll/HllEstimators.hllCompositeEstimate + CompositeInterpolationXTable +
HarmonicNumbers semantics)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from raydedup.hashing import splitmix64
from raydedup.sketches.hll import (
    HllSketch,
    _alpha,
    _bitmap_estimate,
    _composite_estimate,
    _cubic_x_arr_y_stride,
    _harmonic_number,
)


def _hashes(n: int, seed: int) -> np.ndarray:
    return splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 7_777_777))


def _forced_ooo(sk: HllSketch) -> HllSketch:
    out = HllSketch(sk.lg_k)
    out.sparse = None
    out.regs = sk.regs.copy()
    out.out_of_order = True
    return out


def _raw_flajolet(sk: HllSketch) -> float:
    """The pre-composite fallback: Flajolet raw + linear counting."""
    m = sk.m
    inv = np.power(2.0, -sk.regs.astype(np.float64))
    raw = _alpha(m) * m * m / inv.sum()
    zeros = int(np.count_nonzero(sk.regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_harmonic_number_series_matches_partial_sums():
    # the asymptotic branch must agree with direct summation where they meet
    for n in (25, 26, 100, 5_000):
        direct = math.fsum(1.0 / k for k in range(1, n + 1))
        assert _harmonic_number(n) == pytest.approx(direct, rel=1e-14)
    assert _harmonic_number(0) == 0.0
    assert _harmonic_number(3) == pytest.approx(11.0 / 6.0, rel=1e-15)


def test_bitmap_estimate_coupon_collector():
    # hitting half of k=1024 slots ~ seeing k*(H_k - H_{k/2}) ≈ k*ln2 uniques
    k = 1024
    est = _bitmap_estimate(k, k // 2)
    assert est == pytest.approx(k * math.log(2), rel=0.01)


def test_interpolation_exact_at_anchors():
    from raydedup._hll_tables import X_ARRS, Y_STRIDES

    for lg_k in (4, 10, 21):
        x_arr = X_ARRS[lg_k - 4]
        ys = float(Y_STRIDES[lg_k - 4])
        for i in (0, 1, len(x_arr) // 2, len(x_arr) - 2, len(x_arr) - 1):
            got = _cubic_x_arr_y_stride(x_arr, ys, float(x_arr[i]))
            assert got == pytest.approx(ys * i, rel=1e-9, abs=1e-9)


def test_composite_edge_semantics():
    from raydedup._hll_tables import X_ARRS, Y_STRIDES

    lg_k = 10
    k = 1 << lg_k
    x_arr = X_ARRS[lg_k - 4]
    y_stride = float(Y_STRIDES[lg_k - 4])
    # raw below the first anchor -> 0 (reference returns 0 there)
    kxq_huge = _alpha(k) * k * k / (0.5 * x_arr[0])
    assert _composite_estimate(lg_k, kxq_huge, 0, k) == 0.0
    # raw beyond the last anchor -> linear factor scaling of raw
    raw_hi = float(x_arr[-1]) * 2.0
    kxq_lo = _alpha(k) * k * k / raw_hi
    expect = raw_hi * (y_stride * (len(x_arr) - 1) / x_arr[-1])
    assert _composite_estimate(lg_k, kxq_lo, 3, 1) == pytest.approx(expect, rel=1e-12)


def test_composite_beats_raw_flajolet_in_crossover_band():
    """Merged-state trials in the n ≈ 2.2–2.8·k band, where the old hard
    linear-counting/raw threshold creates the worst bias (measured raw bias
    up to +1.8% at lgK=10): the interpolation-corrected composite must cut
    the RMS error there, and stay inside the non-HIP RSE contract at every
    point."""
    lg_k, trials = 10, 40
    m = 1 << lg_k
    comp_rses, raw_rses = [], []
    for mult in (2.2, 2.4, 2.6, 2.8):
        n = int(mult * m)
        comp_err, raw_err = [], []
        for t in range(trials):
            half = _hashes(n // 2, seed=100 * t + 1)
            rest = _hashes(n, seed=100 * t + 1)[n // 2 :]
            a, b = HllSketch(lg_k), HllSketch(lg_k)
            a.update_hashes(half)
            b.update_hashes(rest)
            a.merge(b)
            assert a.out_of_order
            comp_err.append((a.estimate() - n) / n)
            raw_err.append((_raw_flajolet(a) - n) / n)
        comp_rse = float(np.sqrt(np.mean(np.square(comp_err))))
        raw_rse = float(np.sqrt(np.mean(np.square(raw_err))))
        comp_rses.append(comp_rse)
        raw_rses.append(raw_rse)
        assert comp_rse < 1.35 * 1.04 / math.sqrt(m), (mult, comp_rse)
    # averaged over the band the composite strictly improves on the old path
    assert np.mean(comp_rses) < np.mean(raw_rses), (comp_rses, raw_rses)


def test_composite_small_range_tracks_linear_counting():
    """n ≪ k merged state: the crossover rule must pick the bitmap
    estimator, which is near-exact there."""
    lg_k = 12
    n = 300
    a, b = HllSketch(lg_k), HllSketch(lg_k)
    a.update_hashes(_hashes(n // 2, seed=5))
    b.update_hashes(_hashes(n, seed=5)[n // 2 :])
    a.merge(b)
    # force densification of the still-sparse merged set
    if a.sparse is not None:
        a._densify()
        a.out_of_order = True
        a.hip_accum = None
    assert a.estimate() == pytest.approx(n, rel=0.05)


def test_composite_continuous_with_hip_at_high_range():
    """A never-merged sketch's HIP and the same registers' composite must
    agree within a few percent (both unbiased estimators of the same n)."""
    lg_k, n = 11, 80_000
    sk = HllSketch(lg_k)
    sk.update_hashes(_hashes(n, seed=77))
    ooo = _forced_ooo(sk)
    assert ooo.estimate() == pytest.approx(sk.estimate(), rel=0.08)
    assert ooo.estimate() == pytest.approx(n, rel=0.10)
