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


def test_ordered_prefix_sum_float_values(ray_session):
    import ray.data

    from raydedup.scan import ordered_prefix_sum

    rng = np.random.default_rng(2)
    n = 1_000
    vals = rng.uniform(0, 1, n)
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "v": vals})
    out = (
        ordered_prefix_sum(ray.data.from_arrow(t).repartition(7), "doc_id", "v")
        .to_pandas()
        .sort_values("doc_id")
    )
    want = np.cumsum(vals) - vals
    np.testing.assert_allclose(out["cum_exclusive"].to_numpy(), want, rtol=1e-9)
    assert out["cum_exclusive"].dtype == np.float64


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


@pytest.mark.parametrize("n_blocks", [1, 7, 23])
def test_global_ranks_matches_sql_rank_with_tie_runs(ray_session, n_blocks):
    """Heavily quantized values (4 distinct over 3k rows) force tie runs
    that span many blocks — rank()/percent_rank() must match DuckDB's
    window functions exactly."""
    import duckdb
    import ray.data

    from raydedup.scan import global_ranks

    rng = np.random.default_rng(11)
    n = 3_000
    vals = rng.choice([0.25, 0.5, 0.5, 0.75, 1.0], n)  # skewed ties
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "score": vals})
    ds = ray.data.from_arrow(t).repartition(n_blocks)
    out = (
        global_ranks(ds, "score", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT doc_id, rank() OVER (ORDER BY score) r, "
        "percent_rank() OVER (ORDER BY score) p FROM t ORDER BY doc_id"
    ).df()
    np.testing.assert_array_equal(out["rank"].to_numpy(), want["r"].to_numpy())
    np.testing.assert_array_equal(out["pct_rank"].to_numpy(), want["p"].to_numpy())


def test_global_ranks_all_equal_and_single_row(ray_session):
    import ray.data

    from raydedup.scan import global_ranks

    t = pa.table(
        {"doc_id": np.arange(50, dtype=np.int64), "score": np.full(50, 3.0)}
    )
    out = global_ranks(
        ray.data.from_arrow(t).repartition(9), "score", "doc_id"
    ).to_pandas()
    assert (out["rank"] == 1).all() and (out["pct_rank"] == 0.0).all()
    one = pa.table({"doc_id": pa.array([7], pa.int64()), "score": pa.array([1.5])})
    o1 = global_ranks(ray.data.from_arrow(one), "score", "doc_id").to_pandas()
    assert o1["rank"].tolist() == [1] and o1["pct_rank"].tolist() == [0.0]


def test_pack_token_shards_rejects_bad_budget(ray_session):
    import ray.data

    from raydedup.scan import pack_token_shards

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
    with pytest.raises(ValueError):
        pack_token_shards(ray.data.from_arrow(t), budget=0)


def test_deterministic_shuffle_shards(ray_session):
    """One-sort deterministic shuffle: positions are the rank of the
    bijective-LCG key; shards are fixed-size cuts; a re-run reproduces the
    identical assignment (pure function of the id)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from raydedup.scan import (
        deterministic_shuffle_shards,
        shuffle_key_u64,
    )

    ids = np.arange(0, 2337, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": pa.array(ids)}))
    out = (
        deterministic_shuffle_shards(ds, shard_rows=100)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    keys = shuffle_key_u64(ids)
    rank = np.argsort(np.argsort(keys))  # position in key order
    assert (out["shard"].to_numpy() == rank // 100).all()
    assert (out["pos"].to_numpy() == rank % 100).all()
    # every shard except the last is exactly full
    sizes = out.groupby("shard").size()
    assert (sizes.iloc[:-1] == 100).all() and sizes.iloc[-1] == 2337 % 100
    # deterministic across runs
    again = (
        deterministic_shuffle_shards(ds, shard_rows=100)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert again.equals(out)
    # the permutation actually shuffles (not identity / not sorted by id)
    assert (out["shard"].to_numpy() != rank // 2337).any()
    first_shard_ids = out[out["shard"] == 0]["id"].to_numpy()
    assert not (np.sort(first_shard_ids) == ids[:100]).all()


def test_pack_and_chop_exact_layout(ray_session):
    """pack_and_chop vs a scalar replay: spans tile every sequence exactly,
    reconstruct each document contiguously, and split docs across budget
    boundaries."""
    import pyarrow as pa
    import ray.data

    from raydedup.scan import pack_and_chop
    from raydedup.textstats import token_counts

    rng = np.random.default_rng(17)
    texts = [
        " ".join(f"w{rng.integers(100)}" for _ in range(int(rng.integers(0, 40))))
        for _ in range(120)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(120), pa.int64()),
            "text": pa.array(texts),
        }
    )
    budget = 37
    out = (
        pack_and_chop(ray.data.from_arrow(t).repartition(7), budget=budget)
        .to_pandas()
        .sort_values(["seq_id", "seq_off"])
        .reset_index(drop=True)
    )
    nt = token_counts(t)["bpe_tokens"].to_numpy()
    total = int(nt.sum())
    # scalar replay
    cum = np.concatenate([[0], np.cumsum(nt)[:-1]])
    rows = []
    for i in range(120):
        s, e = int(cum[i]), int(cum[i] + nt[i])
        while s < e:
            seq = s // budget
            hi = min(e, (seq + 1) * budget)
            rows.append((i, seq, s - seq * budget, s - int(cum[i]), hi - s))
            s = hi
    import pandas as pd

    ref = (
        pd.DataFrame(rows, columns=["doc_id", "seq_id", "seq_off", "doc_off", "n"])
        .sort_values(["seq_id", "seq_off"])
        .reset_index(drop=True)
    )
    assert out.equals(ref.astype(out.dtypes.to_dict()))
    # every full sequence is tiled end-to-end with no gaps
    per_seq = out.groupby("seq_id")["n"].sum()
    n_full = total // budget
    assert (per_seq.loc[: n_full - 1] == budget).all()
    if total % budget:
        assert per_seq.loc[n_full] == total % budget
    # per-doc reconstruction is contiguous
    for d, g in out.groupby("doc_id"):
        g = g.sort_values("doc_off")
        assert g["doc_off"].iloc[0] == 0
        assert (g["doc_off"] + g["n"]).iloc[-1] == nt[d]
        assert (g["doc_off"].to_numpy()[1:] == (g["doc_off"] + g["n"]).to_numpy()[:-1]).all()
    # at least one doc actually splits across a boundary
    assert (out.groupby("doc_id").size() > 1).any()


def test_ccnet_tercile_bucketing_integer_boundaries(ray_session):
    """The ccnet_buckets rank->bucket rule (3*(rank-1) vs n-1 integer
    cross-multiplication) splits exact terciles and keeps tie runs in one
    bucket; mirrors the driver query's bucket map."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from raydedup.scan import global_ranks

    vals = [float(v) for v in [1, 1, 1, 2, 3, 4, 5, 6, 7]]  # tie run at min
    t = pa.table(
        {
            "id": pa.array(list(range(9)), pa.int64()),
            "score": pa.array(vals, pa.float64()),
        }
    )
    ranked = global_ranks(ray.data.from_arrow(t), "score", "id")
    df = ranked.to_pandas()
    n = len(df)
    k = 3 * (df["rank"].to_numpy(dtype=np.int64) - 1)
    bucket = np.where(k < n - 1, "tail", np.where(k < 2 * (n - 1), "middle", "head"))
    df["bucket"] = bucket
    by_id = df.set_index("id")["bucket"]
    # the three tied minima share rank 1 -> all tail
    assert set(by_id[[0, 1, 2]]) == {"tail"}
    assert by_id[8] == "head"
    # buckets are monotone in score
    order = df.sort_values(["score", "id"])["bucket"].tolist()
    assert order == sorted(order, key=["tail", "middle", "head"].index)
