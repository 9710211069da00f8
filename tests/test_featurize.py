"""Feature hashing + end-to-end text semantic dedup (raydedup/featurize.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.featurize import (
    hashed_count_matrix,
    hashing_vectors,
    l2_normalize,
    text_semdedup,
)
from raydedup.hashing import xxh64_bytes


def _scalar_reference(texts: list[str], dim: int, seed: int) -> np.ndarray:
    """Independent per-token scalar replay of the signed hashing trick."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    ws = " \t\n\r\x0b\x0c"
    for r, t in enumerate(texts):
        toks = [w for w in t.strip(ws).split() if w]
        for tok in toks:
            v = int(xxh64_bytes(tok.encode("utf-8"), seed=seed))
            out[r, v % dim] += -1.0 if (v >> 63) else 1.0
    return out


def test_matrix_matches_scalar_reference():
    texts = [
        "the quick brown fox",
        "the the the repeated token",
        "",
        "   ",
        "unicode tökens ünd emoji \U0001f600 mix",
        "a b c d e f g h i j k l m n o p",
    ]
    got = hashed_count_matrix(pa.array(texts), dim=32, seed=9001)
    ref = _scalar_reference(texts, 32, 9001)
    assert np.array_equal(got, ref)


def test_l2_normalize_unit_rows():
    m = np.array([[3.0, 4.0], [0.0, 0.0], [1.0, 0.0]])
    n = l2_normalize(m)
    assert np.allclose(n[0], [0.6, 0.8])
    assert np.array_equal(n[1], [0.0, 0.0])  # zero rows stay zero
    assert np.allclose((n[[0, 2]] ** 2).sum(axis=1), 1.0)


def test_hashing_vectors_block_invariance(ray_session):
    import ray.data

    texts = [f"doc {i} with shared words alpha beta {i % 7}" for i in range(120)]
    t = pa.table(
        {"id": pa.array(np.arange(120), pa.int64()), "content": pa.array(texts)}
    )
    out1 = (
        hashing_vectors(ray.data.from_arrow(t).repartition(1), dim=64)
        .to_pandas()
        .sort_values("id")
    )
    out9 = (
        hashing_vectors(ray.data.from_arrow(t).repartition(9), dim=64)
        .to_pandas()
        .sort_values("id")
    )
    m1 = np.stack(out1["embedding"].to_numpy())
    m9 = np.stack(out9["embedding"].to_numpy())
    assert np.array_equal(m1, m9)
    # identical texts -> identical vectors; disjoint-token texts -> cos 0
    base = hashed_count_matrix(pa.array(["x y z", "x y z", "p q r"]), 64, 9001)
    assert np.array_equal(base[0], base[1])
    assert float(base[0] @ base[2]) == 0.0


def test_text_semdedup_drops_exact_dups(ray_session):
    import ray.data

    # 60 distinct docs + exact copies of the first 12 at new ids
    texts = [
        f"document number {i} talks about topic {i % 5} in unique words w{i}a w{i}b"
        for i in range(60)
    ]
    all_texts = texts + texts[:12]
    ids = list(range(60)) + list(range(100, 112))
    t = pa.table(
        {"id": pa.array(ids, pa.int64()), "content": pa.array(all_texts)}
    )
    out = (
        text_semdedup(ray.data.from_arrow(t), dim=128, k=3, threshold=0.999)
        .to_pandas()
        .sort_values("id")
        .set_index("id")
    )
    assert len(out) == 72
    for i in range(12):
        # exact pair: co-clustered and exactly one survivor
        assert out.loc[i, "cluster"] == out.loc[100 + i, "cluster"]
        assert int(out.loc[i, "kept"]) + int(out.loc[100 + i, "kept"]) == 1
    # non-duplicated docs all survive
    assert out.loc[12:59, "kept"].all()


def test_bad_norm_raises():
    with pytest.raises(ValueError):
        hashing_vectors(None, norm="max")
