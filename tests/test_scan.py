"""Distributed ordered prefix-scan + token-budget shard packing
(raydedup/scan.py). The scan must be exact across MANY blocks — the
single-block case would never exercise the offset machinery."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(n: int, n_blocks: int, seed: int = 7):
    import ray.data

    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)  # arrive unsorted
    vals = rng.integers(0, 500, n).astype(np.int64)
    t = pa.table({"doc_id": ids, "v": vals[ids]})
    return ray.data.from_arrow(t).repartition(n_blocks), vals


def test_ordered_prefix_sum_multiblock(ray_session):
    from raydedup.scan import ordered_prefix_sum

    n = 5_000
    ds, vals = _ds(n, n_blocks=13)
    out = ordered_prefix_sum(ds, "doc_id", "v").to_pandas().sort_values("doc_id")
    want = np.cumsum(vals) - vals  # exclusive, in id order
    np.testing.assert_array_equal(out["cum_exclusive"].to_numpy(), want)
    np.testing.assert_array_equal(out["doc_id"].to_numpy(), np.arange(n))


def test_ordered_prefix_sum_single_row_and_empty_values(ray_session):
    import ray.data

    from raydedup.scan import ordered_prefix_sum

    t = pa.table({"doc_id": pa.array([5], pa.int64()), "v": pa.array([0], pa.int64())})
    out = ordered_prefix_sum(ray.data.from_arrow(t), "doc_id", "v").to_pandas()
    assert out["cum_exclusive"].tolist() == [0]


def test_pack_token_shards_matches_window_semantics(ray_session):
    """shard_id = exclusive token cumsum // budget, docs in id order —
    verified against a direct numpy window over the same token counts."""
    import ray.data

    from raydedup.scan import pack_token_shards
    from raydedup.textstats import token_counts

    rng = np.random.default_rng(3)
    n = 800
    texts = [
        " ".join(f"w{rng.integers(0, 50)}" for _ in range(int(rng.integers(0, 60))))
        for _ in range(n)
    ]
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    ds = ray.data.from_arrow(t).repartition(11)
    budget = 700
    out = (
        pack_token_shards(ds, budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = token_counts(t)["bpe_tokens"].to_numpy()
    cum = np.cumsum(toks) - toks
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), toks)
    np.testing.assert_array_equal(out["shard_id"].to_numpy(), cum // budget)
    # shards are contiguous in id order and start at 0
    s = out["shard_id"].to_numpy()
    assert s[0] == 0
    assert np.all(np.diff(s) >= 0)


def test_pack_token_shards_rejects_bad_budget(ray_session):
    import ray.data

    from raydedup.scan import pack_token_shards

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
    with pytest.raises(ValueError):
        pack_token_shards(ray.data.from_arrow(t), budget=0)
