"""text_search_topk (raydedup/search.py) vs a string-level brute force:
full ordering (n_matched, total_tf, id), tie handling across blocks,
k-boundary, and zero-match exclusion."""

from __future__ import annotations

import re

import pyarrow as pa


def _brute(docs: dict[int, str | None], terms: tuple[str, ...], k: int):
    rows = []
    ts = set(terms)
    for i, t in docs.items():
        toks = [w for w in re.split(r"[ \t\n\f\r]+", (t or "").strip(" \t\n\r\v\f")) if w]  # RE2 \s class (no \v)
        tf = sum(1 for w in toks if w in ts)
        nm = len(ts & set(toks))
        if tf > 0:
            rows.append((i, nm, tf))
    rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return [(i, nm, tf, rk + 1) for rk, (i, nm, tf) in enumerate(rows[:k])]


def _run(ray, docs, terms, k, nblocks=1):
    import ray.data

    from raydedup.search import text_search_topk

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array([docs[i] for i in docs], pa.string()),
            }
        )
    )
    if nblocks > 1:
        ds = ds.repartition(nblocks)
    t = text_search_topk(ds, terms, k=k).to_pandas()
    return list(
        zip(
            t["doc_id"].astype(int),
            t["n_matched"].astype(int),
            t["total_tf"].astype(int),
            t["rank"].astype(int),
        )
    )


def test_search_bruteforce_and_blocks(ray_session):
    import ray

    docs = {
        1: "merge join merge join merge",        # nm=2 tf=5
        2: "merge column window scan join",      # nm=5... only 5 terms
        3: "merge merge merge merge merge",      # nm=1 tf=5
        4: "window scan",                        # nm=2 tf=2
        5: "nothing relevant here",              # excluded
        6: "window scan",                        # tie with 4 → id order
        7: "",
        8: None,
    }
    terms = ("merge", "join", "column", "window", "scan")
    for k in (3, 5, 50):
        want = _brute(docs, terms, k)
        assert _run(ray, docs, terms, k) == want, k
        assert _run(ray, docs, terms, k, nblocks=4) == want, (k, "blocks")
    top = _run(ray, docs, terms, 50)
    assert top[0][0] == 2  # most distinct terms wins
    assert {r[0] for r in top} == {1, 2, 3, 4, 6}


def test_search_on_documents_fixture(ray_session):
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from raydedup.search import text_search_topk

    sf = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    terms = ("merge", "join", "column", "window", "scan")
    want = _brute(docs, terms, 50)
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    t = text_search_topk(ds, terms, k=50).to_pandas()
    got = list(
        zip(
            t["doc_id"].astype(int),
            t["n_matched"].astype(int),
            t["total_tf"].astype(int),
            t["rank"].astype(int),
        )
    )
    assert got == want and len(got) == 50


def test_text_index_parity_and_pruning(ray_session, tmp_path):
    """Persisted inverted index: identical ranked output to the scan path,
    reading only the <= n_terms part files the terms route to."""
    import os

    import ray
    import ray.data

    from raydedup.search import (
        index_parts_for_terms,
        text_search_indexed,
        text_search_topk,
        write_text_index,
    )

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    meta = write_text_index(ds, str(tmp_path / "idx"), nparts=64)
    assert meta["postings"] > 1000
    terms = ("merge", "join", "column", "window", "scan")
    files = index_parts_for_terms(str(tmp_path / "idx"), terms)
    assert 1 <= len(files) <= len(terms)  # partition pruning contract
    total_parts = len(os.listdir(tmp_path / "idx" / "parts"))
    assert len(files) < total_parts  # strictly fewer than a full read

    want = text_search_topk(ds, terms, k=50).to_pandas()
    got = text_search_indexed(str(tmp_path / "idx"), terms, k=50).to_pandas()
    assert got.equals(want)

    # absent term → still exact; unmatched-only terms → empty result
    got2 = text_search_indexed(
        str(tmp_path / "idx"), ("merge", "zzzznotaterm"), k=10
    ).to_pandas()
    want2 = text_search_topk(ds, ("merge", "zzzznotaterm"), k=10).to_pandas()
    assert got2.equals(want2)

    import pytest

    with pytest.raises(FileExistsError):
        write_text_index(ds, str(tmp_path / "idx"))
    meta2 = write_text_index(ds, str(tmp_path / "idx"), overwrite=True)
    assert meta2 == meta
