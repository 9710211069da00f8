"""Per-key cap curation operator (raydedup/curate.py) vs DuckDB
row_number() semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_cap_per_key_matches_row_number(ray_session):
    import duckdb
    import ray.data

    from raydedup.curate import cap_per_key

    rng = np.random.default_rng(5)
    n = 4_000
    # zipf-ish skew: one huge key, many tiny ones
    keys = np.concatenate(
        [np.zeros(1500, np.int64), rng.integers(1, 400, n - 1500)]
    )
    ids = rng.permutation(n).astype(np.int64)  # unsorted arrival
    t = pa.table({"doc_id": ids, "grp": keys[ids]})
    out = (
        cap_per_key(ray.data.from_arrow(t).repartition(9), "grp", "doc_id", k=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT doc_id, grp FROM (SELECT doc_id, grp, row_number() "
            "OVER (PARTITION BY grp ORDER BY doc_id) rn FROM t) "
            "WHERE rn <= 7 ORDER BY doc_id"
        )
        .df()
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(out["doc_id"].to_numpy(), want["doc_id"].to_numpy())
    np.testing.assert_array_equal(out["grp"].to_numpy(), want["grp"].to_numpy())


def test_curate_corpus_stages(ray_session):
    """Planted cases through the composed pipeline: null text dropped, the
    exact duplicate loses to the smaller id, the cap keeps the 2 smallest
    ids per source, shard ids follow the exclusive token cumsum."""
    import ray.data

    from raydedup.curate import curate_corpus
    from raydedup.textstats import token_counts

    good = "the quick brown fox jumps over the lazy dog again and again " * 8
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
            "text": [good, good, good + " unique tail", None,
                     "!!!! ???? $$$$ %%%%", good + " other tail",
                     good + " third tail"],
            "source": ["a", "a", "a", "a", "b", "a", "a"],
        }
    )
    out = (
        curate_corpus(
            ray.data.from_arrow(t),
            quality_threshold=0.5,
            cap_key="source",
            cap_k=2,
            shard_budget=120,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 (dup of 0) gone, doc 3 (null) gone, doc 4 (junk quality) gone,
    # docs 5/6 capped out by source-a k=2 (0 and 2 are the smallest ids)
    assert out["doc_id"].tolist() == [0, 2]
    toks = token_counts(t.take(pa.array([0, 2])))["bpe_tokens"].to_numpy()
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), toks)
    cum = np.cumsum(toks) - toks
    np.testing.assert_array_equal(out["shard_id"].to_numpy(), cum // 120)


def test_split_assign_hash_mode(ray_session):
    """Hash splits: scalar splitmix64 parity, fraction accuracy on 50k
    ids, determinism across calls, and stability under corpus growth (old
    ids keep their split when new ids arrive)."""
    import ray.data

    from raydedup.curate import split_assign

    def scalar_splitmix64(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) & (1 << 64) - 1
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
        return z ^ (z >> 31)

    n = 50_000
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64)})
    out = (
        split_assign(ray.data.from_arrow(t), "doc_id", fr, seed=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # scalar parity on a sample
    cuts = np.ceil(np.cumsum([0.8, 0.1, 0.1]) * 1_000_000)[:-1]
    for i in (0, 1, 999, 31337, 49999):
        b = scalar_splitmix64(i ^ 7) % 1_000_000
        want = "train" if b < cuts[0] else ("val" if b < cuts[1] else "test")
        assert out["split"][i] == want, (i, b)
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.01
    assert abs(frac["val"] - 0.1) < 0.005
    assert abs(frac["test"] - 0.1) < 0.005
    # growth stability: first n/2 ids get identical splits in a larger run
    half = (
        split_assign(
            ray.data.from_arrow(t.slice(0, n // 2)), "doc_id", fr, seed=7
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (half["split"] == out["split"][: n // 2]).all()


def test_split_assign_validation(ray_session):
    import ray.data

    import pytest as _pytest

    from raydedup.curate import split_assign

    t = pa.table({"doc_id": pa.array([1], pa.int64())})
    ds = ray.data.from_arrow(t)
    with _pytest.raises(ValueError):
        split_assign(ds, "doc_id", {"a": 0.7, "b": 0.4})
    with _pytest.raises(ValueError):
        split_assign(ds, "doc_id", {})
    with _pytest.raises(ValueError):
        split_assign(ds, "doc_id", {"a": 1.0}, method="nope")


def test_cap_per_key_string_keys_and_bad_k(ray_session):
    import ray.data

    from raydedup.curate import cap_per_key

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(10), pa.int64()),
            "src": ["a", "b", "a", "a", "b", "c", "a", "c", "b", "a"],
        }
    )
    out = cap_per_key(ray.data.from_arrow(t), "src", "doc_id", k=2).to_pandas()
    got = set(zip(out["src"], out["doc_id"]))
    assert got == {("a", 0), ("a", 2), ("b", 1), ("b", 4), ("c", 5), ("c", 7)}
    with pytest.raises(ValueError):
        cap_per_key(ray.data.from_arrow(t), "src", "doc_id", k=0)


def test_split_assign_boundary_bucket_no_float_drift(ray_session):
    """0.9/0.05/0.05 at 1e6 buckets: the 950000 cumulative cut lands
    epsilon ABOVE the integer in floats; plain ceil shifted the boundary
    bucket to the wrong label (regression). Modulo mode must match the
    exact SQL semantics `bucket < frac*buckets` at every boundary."""
    import ray.data

    from raydedup.curate import split_assign

    ids = np.array([899_999, 900_000, 949_999, 950_000], dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    out = (
        split_assign(
            ray.data.from_arrow(t),
            "doc_id",
            {"train": 0.9, "val": 0.05, "test": 0.05},
            method="modulo",
            buckets=1_000_000,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["split"]) == ["train", "val", "val", "test"]
