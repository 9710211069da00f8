"""Unit + pipeline tests for the round-2 additions: kll_sketch /
hllmap_unique / tuple_sketch aggregates, UniqueCountMap.update_block, and
KS-delta exactness in the exact regime."""

import pickle

import numpy as np
import pyarrow as pa
import pytest

from raydedup.sketches.hllmap import UniqueCountMap
from raydedup.sketches.kll import KllSketch
from raydedup.sketches.tuple import tuple_jaccard


def _brute_ks(a: np.ndarray, b: np.ndarray) -> float:
    pts = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pts, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pts, side="right") / len(b)
    return float(np.abs(fa - fb).max())


def test_ks_delta_exact_regime_matches_brute_force():
    rng = np.random.default_rng(7)
    a = rng.normal(0.0, 1.0, 5000)
    b = rng.normal(0.3, 1.2, 4000)
    ska, skb = KllSketch(k=1 << 14), KllSketch(k=1 << 14)
    ska.update_many(a)
    skb.update_many(b)
    assert KllSketch.ks_delta(ska, skb) == _brute_ks(a, b)


def test_update_block_matches_per_row_updates_with_promotion():
    rng = np.random.default_rng(11)
    # key 0 stays in the coupon tier; key 1 crosses promote_at
    keys = np.concatenate([np.zeros(10, np.int64), np.ones(200, np.int64)])
    hashes = np.concatenate(
        [
            rng.integers(0, 1 << 30, 10).astype(np.uint64),
            rng.integers(0, 1 << 62, 200).astype(np.uint64),
        ]
    )
    m_row, m_blk = UniqueCountMap(lg_k=12), UniqueCountMap(lg_k=12)
    m_row.update_many(keys, hashes)
    # feed the block path in two chunks to cross the promotion mid-stream
    m_blk.update_block(keys[:50], hashes[:50])
    m_blk.update_block(keys[50:], hashes[50:])
    bk, be = m_blk.items()
    rk, re_ = m_row.items()
    assert np.array_equal(bk, rk)
    assert np.allclose(be, re_)
    # coupon-tier key is exact
    exact0 = len(np.unique(hashes[:10]))
    assert be[list(bk).index(0)] == exact0


def test_hllmap_items_merge_exactness():
    m1, m2 = UniqueCountMap(), UniqueCountMap()
    m1.update_block(np.array([1, 1, 2]), np.array([10, 11, 20], np.uint64))
    m2.update_block(np.array([1, 3]), np.array([11, 30], np.uint64))
    m1.merge(m2)
    keys, ests = m1.items()
    assert keys.tolist() == [1, 2, 3]
    assert ests.tolist() == [2.0, 1.0, 1.0]


@pytest.mark.usefixtures("ray_session")
def test_kll_sketch_aggregate_round_trip():
    import ray.data

    from raydedup.aggregates import kll_sketch

    vals = np.arange(1000, dtype=np.float64)
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    res = ds.aggregate(kll_sketch("v", k=1 << 12, name="sk"))
    sk = KllSketch.deserialize(res["sk"])
    assert sk.n == 1000
    assert sk.quantile(0.5) == np.sort(vals)[499]


@pytest.mark.usefixtures("ray_session")
def test_hllmap_unique_aggregate_exact_tier():
    import ray.data

    from raydedup.aggregates import hllmap_unique

    keys = np.repeat(np.arange(20, dtype=np.int64), 5)
    ids = np.array([f"t{v % 4}" for v in range(100)])
    ds = ray.data.from_arrow(pa.table({"k": keys, "id": ids}))
    res = ds.aggregate(hllmap_unique("k", "id", name="m"))
    got_k, got_e = pickle.loads(res["m"]).items()
    assert got_k.tolist() == list(range(20))
    # every key sees ids {t0..t3} at least once except boundary effects:
    # compute the truth directly
    import pandas as pd

    truth = (
        pd.DataFrame({"k": keys, "id": ids}).groupby("k")["id"].nunique().sort_index()
    )
    assert np.allclose(got_e, truth.to_numpy().astype(float))


@pytest.mark.usefixtures("ray_session")
def test_tuple_sketch_aggregate_jaccard_exact():
    import ray.data

    from raydedup.aggregates import tuple_sketch

    a_keys = np.arange(0, 80, dtype=np.int64)
    b_keys = np.arange(40, 120, dtype=np.int64)
    tbl = pa.table(
        {
            "g": ["a"] * len(a_keys) + ["b"] * len(b_keys),
            "key": np.concatenate([a_keys, b_keys]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    rows = ds.groupby("g").aggregate(tuple_sketch("key", k=1 << 14, name="sk")).take_all()
    sks = {r["g"]: pickle.loads(r["sk"]) for r in rows}
    lb, est, ub = tuple_jaccard(sks["a"], sks["b"])
    assert est == 40 / 120
    assert lb <= est <= ub
