"""HIP estimation on engine-built HLL sketches (hll/HllEstimators.java,
AbstractHllArray.hipAndKxQIncrementalUpdate semantics)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from raydedup.hashing import splitmix64
from raydedup.sketches.hll import HllSketch


def _hashes(n: int, seed: int) -> np.ndarray:
    return splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003))


def _sequential_hip(hashes: np.ndarray, lg_k: int) -> tuple[float, float, np.ndarray]:
    """Pure-python reference for the HIP recurrence: per item, if its rho
    beats the register, hip += m/kxq BEFORE kxq absorbs the delta."""
    m = 1 << lg_k
    regs = np.zeros(m, dtype=np.int64)
    kxq = float(m)
    hip = 0.0
    for h in hashes.tolist():
        idx = h & (m - 1)
        hi = h >> 32
        rho = 33 - hi.bit_length() if hi else 33
        if rho > regs[idx]:
            hip += m / kxq
            kxq += math.ldexp(1.0, -rho) - math.ldexp(1.0, -int(regs[idx]))
            regs[idx] = rho
    return hip, kxq, regs


@pytest.mark.parametrize("n", [500, 5_000, 60_000])
def test_vectorized_hip_matches_sequential(n):
    """The slot-sorted prefix-max batch update must reproduce the item-at-a-
    time recurrence exactly (same accepted set, same fp op order per slot)."""
    lg_k = 8
    h = _hashes(n, seed=n)
    sk = HllSketch(lg_k)
    sk._densify()  # start dense: HIP is path-dependent, and the sparse
    # tier's promotion replays its deduped SET (arbitrary order), exactly
    # like the reference's coupon→HLL replay — so stream-order parity is
    # only defined for the dense kernel itself
    # feed in uneven batch sizes to exercise batch boundaries
    pos, step = 0, 997
    while pos < n:
        sk.update_hashes(h[pos : pos + step])
        pos += step
        step = step * 2 + 1
    hip, kxq, regs = _sequential_hip(h, lg_k)
    assert not sk.out_of_order and sk.hip_accum is not None
    np.testing.assert_array_equal(sk.regs.astype(np.int64), regs)
    assert sk.hip_accum == pytest.approx(hip, rel=1e-12)
    assert sk.kxq == pytest.approx(kxq, rel=1e-12)
    # incremental kxq must not drift from the register array
    assert sk.kxq == pytest.approx(
        float(np.ldexp(1.0, -sk.regs.astype(np.int64)).sum()), rel=1e-9
    )


def test_hip_beats_raw_estimator_rse():
    """StreamingValidation-style trials: HIP RSE ≈ 0.836/√m, raw ≈ 1.04/√m."""
    lg_k, n, trials = 10, 200_000, 40
    m = 1 << lg_k
    hip_err, raw_err = [], []
    for t in range(trials):
        sk = HllSketch(lg_k)
        sk.update_hashes(_hashes(n, seed=t + 1))
        est_hip = sk.estimate()
        sk2 = HllSketch(lg_k)
        sk2.regs = sk.regs
        sk2.sparse = None
        sk2.out_of_order = True  # force the raw/Flajolet path
        est_raw = sk2.estimate()
        hip_err.append((est_hip - n) / n)
        raw_err.append((est_raw - n) / n)
    hip_rse = float(np.sqrt(np.mean(np.square(hip_err))))
    raw_rse = float(np.sqrt(np.mean(np.square(raw_err))))
    assert hip_rse < raw_rse, (hip_rse, raw_rse)
    assert hip_rse < 1.35 * 0.8326 / math.sqrt(m), hip_rse
    assert hip_rse > 0.5 * 0.8326 / math.sqrt(m), hip_rse  # not secretly exact


def test_merge_invalidates_hip_and_serde_preserves_it():
    lg_k = 8
    a = HllSketch(lg_k)
    a.update_hashes(_hashes(30_000, seed=1))
    assert a.sparse is None and a.hip_accum is not None
    # serde round-trip keeps the in-order HIP state bit-exactly
    rt = HllSketch.deserialize(a.serialize())
    assert rt.hip_accum == a.hip_accum and rt.kxq == a.kxq
    assert not rt.out_of_order
    assert rt.estimate() == a.estimate()
    np.testing.assert_array_equal(rt.regs, a.regs)
    # merging flips to the raw estimator
    b = HllSketch(lg_k)
    b.update_hashes(_hashes(30_000, seed=2))
    a.merge(b)
    assert a.out_of_order and a.hip_accum is None
    rt2 = HllSketch.deserialize(a.serialize())
    assert rt2.out_of_order and rt2.hip_accum is None
    assert rt2.estimate() == a.estimate()


def test_densify_replay_continuity():
    """Promotion from the exact sparse tier seeds HIP by replaying the
    (deduped) hash set — the estimate stays near-exact at the boundary,
    like the reference's coupon→HLL promotion replay."""
    lg_k = 8  # m=256, sparse limit 32
    sk = HllSketch(lg_k)
    h = _hashes(40, seed=9)
    sk.update_hashes(h)
    assert sk.sparse is None  # promoted
    assert sk.hip_accum == pytest.approx(40, rel=0.25)
    assert sk.estimate() == sk.hip_accum


def test_wire_image_carries_in_order_hip():
    from raydedup.interop_hll import hll_from_reference_bytes, hll_to_reference_bytes

    sk = HllSketch(10)
    sk.update_hashes(_hashes(50_000, seed=3))
    for tgt in ("hll4", "hll6", "hll8"):
        raw = hll_to_reference_bytes(sk, tgt=tgt)
        rd = hll_from_reference_bytes(raw)
        assert not rd.out_of_order
        assert rd.hip_accum == pytest.approx(sk.hip_accum, rel=1e-12)
        assert rd.estimate() == pytest.approx(sk.estimate(), rel=1e-12)
    # merged sketch still writes the OOO image
    other = HllSketch(10)
    other.update_hashes(_hashes(1000, seed=4))
    sk.merge(other)
    rd = hll_from_reference_bytes(hll_to_reference_bytes(sk, tgt="hll8"))
    assert rd.out_of_order and rd.hip_accum is None
