"""curate_corpus_v2 (raydedup/curate.py): the five-stage composition vs
its chained-CTE DuckDB mirror at sf0.001, plus keep_cols pass-through
checks for the extended strip/lm stages."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def test_curate_v2_matches_sql_mirror(ray_session):
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = (
        entry.queries()["curate_corpus_v2"](sf)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["curate_corpus_v2"])
        .fetchdf()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 100
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype("int64"),
        want[sorted(want.columns)].astype("int64"),
    )
    # the composition actually curates: fewer rows than the corpus, more
    # than one shard
    assert got["shard_id"].max() >= 1


def test_strip_keep_cols_passthrough(ray_session):
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.spans import strip_duplicate_spans

    base = " ".join(f"tok{j}" for j in range(30))
    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "content": pa.array([base, base], pa.string()),
            "repo": pa.array(["a/x", "b/y"], pa.string()),
        }
    )
    out = (
        strip_duplicate_spans(
            ray.data.from_arrow(tbl),
            window=20,
            cfg=DEFAULT_CONFIG,
            keep_cols=("repo",),
        )
        .to_pandas()
        .sort_values("id")
    )
    assert list(out["repo"]) == ["a/x", "b/y"]
    assert list(out["n_removed"]) == [0, 30]  # copy fully stripped
    # join mode carries keep_cols too (round-3 ADVICE: the composed
    # curate_corpus_v2 must degrade to join mode above broadcast_limit
    # instead of hard-failing)
    out_join = (
        strip_duplicate_spans(
            ray.data.from_arrow(tbl),
            window=20,
            cfg=DEFAULT_CONFIG,
            mode="join",
            keep_cols=("repo",),
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out_join.equals(out.reset_index(drop=True))


def test_lm_keep_cols_passthrough(ray_session):
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.lm import lm_scores

    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "content": pa.array(["a b a b a b", "x"], pa.string()),
            "repo": pa.array(["r1", "r2"], pa.string()),
        }
    )
    out = (
        lm_scores(
            ray.data.from_arrow(tbl),
            DEFAULT_CONFIG,
            min_count=2,
            keep_cols=("content", "repo"),
        )
        .to_pandas()
        .sort_values("id")
    )
    assert list(out["repo"]) == ["r1", "r2"]
    assert list(out["content"]) == ["a b a b a b", "x"]
    assert list(out["n_bigrams"]) == [5, 0]
