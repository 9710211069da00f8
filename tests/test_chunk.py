"""chunk_documents (raydedup/chunk.py) vs a string-level brute force:
stride/window geometry, short docs, tail chunks, empty/null docs."""

from __future__ import annotations

import re

import pyarrow as pa


def _brute(docs: dict[int, str | None], window: int, stride: int):
    out = []
    for i, t in sorted(docs.items()):
        s = (t or "").strip(" \t\n\r\v\f")
        if not s:
            continue
        toks = re.split(r"[ \t\n\f\r]+", s)  # RE2 \s class (no \v)
        start = 0
        cid = 0
        while start < len(toks):
            seg = toks[start : start + window]
            out.append((i, cid, len(seg), " ".join(seg)))
            cid += 1
            start += stride
    return out


def _run(ray, docs, window, stride):
    import ray.data

    from raydedup.chunk import chunk_documents

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array([docs[i] for i in docs], pa.string()),
            }
        )
    )
    t = (
        chunk_documents(ds, window=window, stride=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    return list(
        zip(
            t["doc_id"].astype(int),
            t["chunk_id"].astype(int),
            t["n_tokens"].astype(int),
            t["text"],
        )
    )


def test_chunking_bruteforce(ray_session):
    import ray

    docs = {
        1: " ".join(f"t{j}" for j in range(10)),   # exactly 2 chunks at 6/4
        2: " ".join(f"u{j}" for j in range(4)),    # single short chunk
        3: " ".join(f"v{j}" for j in range(13)),   # tail chunk of 1
        4: "solo",
        5: "",
        6: None,
        7: "   \t ",
        8: " ".join(f"w{j}" for j in range(6)),    # exactly one window
        # RE2 \s has NO \v: '\v' stays inside a token (engine, oracle, and
        # this brute force all agree — review-finding regression)
        9: "a \v b " + " ".join(f"z{j}" for j in range(7)),
    }
    for window, stride in ((6, 4), (6, 6), (3, 1), (128, 96)):
        assert _run(ray, docs, window, stride) == _brute(docs, window, stride), (
            window,
            stride,
        )
    import pytest

    from raydedup.chunk import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(None, window=4, stride=5)


def test_chunking_on_documents_fixture(ray_session):
    import pyarrow.parquet as pq
    import ray

    sf = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    want = _brute(docs, 32, 24)
    import ray.data

    from raydedup.chunk import chunk_documents

    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    t = (
        chunk_documents(ds, window=32, stride=24)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    got = list(
        zip(
            t["doc_id"].astype(int),
            t["chunk_id"].astype(int),
            t["n_tokens"].astype(int),
            t["text"],
        )
    )
    assert got == want and len(got) > len(docs)
