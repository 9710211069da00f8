"""Regression tests for the round-2 third-party review findings:

* distributed union-find must emit self-loop-only nodes (collect-path parity)
* TupleSketch._rebuild vectorized run-combine must match the per-row
  _combine chain for every summary mode
* njaccard _pairs_block (segmented pair emitter) must match brute-force
  triu pairs per posting list, including the max_posting cap
* tokenize_hashes must trim ONLY ASCII whitespace (oracle trim parity):
  Unicode WS padding is token content, exactly as DuckDB's trim() keeps it
* corpus cache tags must not collide across different dirs sharing a
  basename
* the documents-table oracle SQL must agree with the engine on NULL text
  (engine fill_null('') semantics)
"""

import numpy as np
import pyarrow as pa
import pytest


def test_unionfind_distributed_emits_selfloop_nodes(ray_session):
    import ray.data

    from raydedup.unionfind import cluster_edges

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([13, 1, 2], pa.int64()),
                "dst": pa.array([13, 2, 3], pa.int64()),
            }
        )
    )
    got_d = (
        cluster_edges(edges, method="distributed")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    got_c = (
        cluster_edges(edges, method="collect")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got_d.values.tolist() == got_c.values.tolist()
    assert 13 in set(got_d["id"])
    assert dict(zip(got_d["id"], got_d["cluster_id"]))[13] == 13


@pytest.mark.parametrize("mode", ["sum", "min", "max", "always_one", "increment"])
def test_tuple_rebuild_matches_combine_chain(mode):
    from raydedup.sketches.tuple import TupleSketch, _combine

    rng = np.random.default_rng(7)
    n = 500
    # hashes drawn from a small pool -> many duplicate runs (incl. singletons)
    h = rng.integers(1, 60, n).astype(np.uint64)
    v = rng.normal(size=(n, 2))
    sk = TupleSketch.empty(1 << 12, 2, mode).update_many(h, v)

    # brute-force: fold duplicates with the _combine chain in sorted order
    order = np.argsort(h, kind="stable")
    hs, vs = h[order], v[order]
    expect: dict[int, np.ndarray] = {}
    for hh, vv in zip(hs.tolist(), vs):
        expect[hh] = (
            vv.astype(np.float64)
            if hh not in expect
            else _combine(mode, expect[hh], vv.astype(np.float64))
        )
    keys = np.array(sorted(expect), dtype=np.uint64)
    assert np.array_equal(sk.hashes, keys)
    want = np.stack([expect[int(kk)] for kk in keys])
    assert np.allclose(sk.values, want)


def _brute_pairs(sh, ids, nsh, max_posting):
    out = set()
    for g in np.unique(sh):
        mask = sh == g
        members = sorted(zip(ids[mask].tolist(), nsh[mask].tolist()))
        if max_posting is not None and len(members) > max_posting:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add(
                    (members[i][0], members[j][0], members[i][1], members[j][1])
                )
    return out


@pytest.mark.parametrize("max_posting", [None, 4])
def test_njaccard_pairs_block_matches_bruteforce(max_posting):
    from raydedup.njaccard import _pairs_block

    rng = np.random.default_rng(3)
    n = 400
    sh = rng.integers(0, 50, n).astype(np.uint64)
    ids = rng.integers(0, 1000, n).astype(np.int64)
    # one posting per (sh, id): dedupe like segment_unique guarantees
    _, uidx = np.unique(sh.astype(np.int64) * 10007 + ids, return_index=True)
    sh, ids = sh[uidx], ids[uidx]
    nsh = (ids % 97 + 5).astype(np.int32)
    block = pa.table(
        {
            "sh": pa.array(sh, pa.uint64()),
            "id": pa.array(ids, pa.int64()),
            "nsh": pa.array(nsh, pa.int32()),
        }
    )
    out = _pairs_block(max_posting)(block)
    got = set(
        zip(
            out.column("src").to_pylist(),
            out.column("dst").to_pylist(),
            out.column("na").to_pylist(),
            out.column("nb").to_pylist(),
        )
    )
    assert got == _brute_pairs(sh, ids, nsh, max_posting)
    assert all(s < d for s, d, _, _ in got)


def test_tokenize_ascii_trim_only():
    from raydedup.tokenize import tokenize_hashes

    arr = pa.array(["hello world", " hello world", " hello world \t"])
    flat, off = tokenize_hashes(arr, seed=42)
    rows = [flat[off[i] : off[i + 1]] for i in range(3)]
    # ASCII padding is trimmed -> same tokens as unpadded
    assert np.array_equal(rows[0], rows[2])
    # NBSP is NOT whitespace to the oracle's trim(): '\xa0hello' is a
    # distinct first token
    assert len(rows[1]) == 2
    assert rows[1][0] != rows[0][0]
    assert rows[1][1] == rows[0][1]


def test_corpus_cache_tag_not_basename_only(tmp_path):
    from raydedup.corpus import _sf_tag

    a = tmp_path / "a" / "sf0.01"
    b = tmp_path / "b" / "sf0.01"
    assert _sf_tag(str(a)) != _sf_tag(str(b))
    assert _sf_tag(str(a)) == _sf_tag(str(a) + "/")


def test_documents_oracles_null_text_parity(ray_session, tmp_path):
    """Engine treats NULL text as '' (fill_null); the oracle SQL must too."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["hello, World 42", None, ""], pa.string()),
            "lang": pa.array(["en", "en", "en"]),
            "source": pa.array(["t", "t", "t"]),
            "n_chars": pa.array([15, 0, 0], pa.int64()),
        }
    )
    sf = tmp_path / "sfnull"
    sf.mkdir()
    pq.write_table(tbl, sf / "documents.parquet")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    for name in ["text_stats", "token_counts", "quality_scores", "lang_id"]:
        import pandas as pd

        got = qs[name](str(sf))
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        want = con.execute(sqls[name]).df()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        assert list(got.columns.sort_values()) == list(want.columns.sort_values()), name
        for col in got.columns:
            g, w = got[col].to_numpy(), want[col].to_numpy()
            if g.dtype.kind == "f":
                assert np.allclose(g, w.astype(np.float64), equal_nan=False), (
                    name,
                    col,
                    g,
                    w,
                )
            else:
                assert (g == w).all(), (name, col, g, w)
    con.close()
