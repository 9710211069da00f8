from __future__ import annotations

import numpy as np

from raydedup.hashing import splitmix64
from raydedup.sketches.hllmap import UniqueCountMap


def _ids(lo: int, n: int) -> np.ndarray:
    return splitmix64(np.arange(lo, lo + n, dtype=np.uint64))


def test_exact_below_promotion():
    m = UniqueCountMap(promote_at=16)
    for h in _ids(0, 10):
        m.update(1, int(h))
    assert m.estimate(1) == 10.0


def test_promotion_and_accuracy():
    m = UniqueCountMap(lg_k=10, promote_at=16)
    m.update_many(np.full(5000, 7, dtype=np.int64), _ids(0, 5000))
    est = m.estimate(7)
    assert abs(est - 5000) / 5000 < 0.15
    assert 7 in m.hlls  # promoted


def test_powerlaw_memory_tiering():
    m = UniqueCountMap(promote_at=16)
    rng = np.random.default_rng(1)
    for key in range(200):
        n = max(1, int(2000 / (key + 1)))
        m.update_many(np.full(n, key, dtype=np.int64), _ids(key * 10**6, n))
    # exactly the hot head (n > promote_at) got promoted to full sketches
    want_promoted = sum(1 for key in range(200) if max(1, int(2000 / (key + 1))) > 16)
    assert len(m.hlls) == want_promoted
    assert m.active_keys == 200
    assert 199 in m.coupons  # the tail stays in the cheap coupon tier


def test_merge_matches_single_stream():
    a, b = UniqueCountMap(promote_at=8), UniqueCountMap(promote_at=8)
    a.update_many(np.full(100, 5, dtype=np.int64), _ids(0, 100))
    b.update_many(np.full(100, 5, dtype=np.int64), _ids(50, 100))
    a.merge(b)
    c = UniqueCountMap(promote_at=8)
    c.update_many(np.full(150, 5, dtype=np.int64), _ids(0, 150))
    assert abs(a.estimate(5) - c.estimate(5)) / c.estimate(5) < 0.02
    # disjoint keys survive merge
    b2 = UniqueCountMap(promote_at=8)
    b2.update_many(np.full(3, 9, dtype=np.int64), _ids(0, 3))
    a.merge(b2)
    assert a.estimate(9) == 3.0
