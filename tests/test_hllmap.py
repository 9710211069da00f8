from __future__ import annotations

import time

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
    assert 7 in m.hot_keys  # promoted


def test_powerlaw_memory_tiering():
    m = UniqueCountMap(promote_at=16)
    for key in range(200):
        n = max(1, int(2000 / (key + 1)))
        m.update_many(np.full(n, key, dtype=np.int64), _ids(key * 10**6, n))
    # exactly the hot head (n > promote_at) got promoted to full sketches
    want_promoted = sum(1 for key in range(200) if max(1, int(2000 / (key + 1))) > 16)
    assert len(m.hot_keys) == want_promoted
    assert m.active_keys == 200
    assert 199 in m.coupon_keys  # the tail stays in the cheap coupon tier


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


def test_merge_exactly_equals_single_stream_registers():
    # register banks are order-independent: split stream vs single stream
    # must agree EXACTLY per key (promotion replays coupons into registers)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 300, 20_000).astype(np.int64)
    hashes = splitmix64(rng.integers(0, 1 << 62, 20_000).astype(np.uint64))
    a, b = UniqueCountMap(promote_at=16), UniqueCountMap(promote_at=16)
    a.update_block(keys[:9_000], hashes[:9_000])
    b.update_block(keys[9_000:], hashes[9_000:])
    a.merge(b)
    c = UniqueCountMap(promote_at=16)
    c.update_block(keys, hashes)
    ka, ea = a.items()
    kc, ec = c.items()
    assert (ka == kc).all()
    assert np.allclose(ea, ec, rtol=0, atol=0)


class _LoopMap:
    """The pre-vectorization per-distinct-key reference (dict of sets +
    HllSketch per hot key) — kept here only as the bench baseline."""

    def __init__(self, lg_k: int = 10, promote_at: int = 16):
        from raydedup.sketches.hll import HllSketch

        self._HllSketch = HllSketch
        self.lg_k, self.promote_at = lg_k, promote_at
        self.coupons: dict[int, set[int]] = {}
        self.hlls: dict = {}

    def update_block(self, keys: np.ndarray, id_hashes: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        h = np.asarray(id_hashes, dtype=np.uint64)
        order = np.lexsort((h, keys))
        k_s, h_s = keys[order], h[order]
        starts = np.flatnonzero(np.concatenate([[True], k_s[1:] != k_s[:-1]]))
        bounds = np.append(starts, len(k_s))
        for i, s in enumerate(starts):
            key = int(k_s[s])
            run = h_s[s : bounds[i + 1]]
            sk = self.hlls.get(key)
            if sk is not None:
                sk.update_hashes(run)
                continue
            c = self.coupons.setdefault(key, set())
            c.update(run.tolist())
            if len(c) > self.promote_at:
                sk = self._HllSketch(self.lg_k)
                sk.update_hashes(np.fromiter(self.coupons.pop(key), dtype=np.uint64))
                self.hlls[key] = sk


def test_block_update_throughput_vs_per_key_loop():
    # VERDICT r02 item 2: >= 5x block-update throughput on 1M skewed keys.
    # The margin is far below the typical observed speedup, so VM timing
    # noise (2-3x swings) cannot flip it.
    rng = np.random.default_rng(42)
    n = 1_000_000
    # the operator's contract is MILLIONS of skewed keys
    # (hllmap/UniqueCountMap.java:36-43: >100M keys): ~470k distinct here,
    # zipf-skewed with a 50k-row hottest key
    keys = (rng.zipf(1.05, n) % 2_000_000).astype(np.int64)
    hashes = splitmix64(rng.integers(0, 1 << 62, n).astype(np.uint64))
    blocks = [(keys[i : i + 250_000], hashes[i : i + 250_000])
              for i in range(0, n, 250_000)]

    def _time(factory):
        best, m = None, None
        for _ in range(2):  # best-of-2: this VM's wall clock swings 2-3x
            m = factory()
            t0 = time.perf_counter()
            for kb, hb in blocks:
                m.update_block(kb, hb)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, m

    t_loop, loop = _time(_LoopMap)
    t_vec, vec = _time(UniqueCountMap)
    assert t_loop / t_vec >= 5.0, (t_loop, t_vec)
    # and the two agree: same promoted set, identical coupon-tier counts
    assert set(vec.hot_keys.tolist()) == set(loop.hlls)
    ks, est = vec.items()
    cold = ~np.isin(ks, vec.hot_keys)
    for k, e in zip(ks[cold][:50].tolist(), est[cold][:50].tolist()):
        assert e == len(loop.coupons[k])


def test_hllmap_aggregate_estimation_regime():
    """The AGGREGATE glue (hllmap_unique.acc) must remix the 63-bit theta
    hashes before the map's HLL tier (disjoint low/high bit fields): the
    un-remixed top-bit-zero hashes biased rho +1 → ~2x overestimate at
    high per-key cardinality (caught by scripts/estimation_sweep.py)."""
    import pickle

    import numpy as np
    import pyarrow as pa

    from raydedup.aggregates import hllmap_unique

    n = 60_000
    block = pa.table(
        {
            "k": pa.array(np.ones(n, dtype=np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64) * 2654435761 % (1 << 40)),
        }
    )
    agg = hllmap_unique("k", "v", lg_k=10)
    state = agg.accumulate_block(None, block)
    m = pickle.loads(state)
    keys, ests = m.items()
    err = abs(float(ests[0]) - n) / n
    # 3 sigma at lgK=10: 3 * 1.04/32 ≈ 9.75%
    assert err < 0.0975, err
