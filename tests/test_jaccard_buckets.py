"""Controlled-Jaccard planted corpus (FIXTURES.md F1 near-dup buckets):
pairs at J ≈ {0.97, 0.9, 0.8} must cluster at threshold 0.75 while the
J ≈ 0.6 bucket must NOT — the engine-level analog of the reference's
'k entries differing by one' sensitivity case
(T/theta/JaccardSimilarityTest.java:100-106)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import SigConfig
from tests.reference_impls import exact_jaccard, shingle_set

CFG = SigConfig(kmv_k=512, jaccard_threshold=0.75, max_bucket_size=64)


def _mutate_to_target(toks: list[str], target_j: float, vocab, rng) -> list[str]:
    """Iteratively mutate until the 5-gram Jaccard is near target."""
    base_set = shingle_set(toks, 5, CFG.seed)
    cur = list(toks)
    for _ in range(400):
        j = exact_jaccard(base_set, shingle_set(cur, 5, CFG.seed))
        if j <= target_j:
            break
        i = int(rng.integers(len(cur)))
        cur[i] = vocab[int(rng.integers(len(vocab)))]
    return cur


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(500)]
    rows_id, rows_content, buckets = [], [], {}
    next_id = 0
    for i in range(12):
        toks = [vocab[j] for j in rng.integers(0, 500, 120)]
        base_id = next_id
        rows_id.append(next_id); rows_content.append(" ".join(toks)); next_id += 1
        for target in (0.97, 0.9, 0.8, 0.6):
            mut = _mutate_to_target(toks, target, vocab, rng)
            true_j = exact_jaccard(
                shingle_set(toks, 5, CFG.seed), shingle_set(mut, 5, CFG.seed)
            )
            rows_id.append(next_id)
            rows_content.append(" ".join(mut))
            buckets.setdefault(target, []).append((base_id, next_id, true_j))
            next_id += 1
    tbl = pa.table(
        {
            "id": pa.array(rows_id, pa.int64()),
            "repo": pa.array(["r"] * len(rows_id)),
            "path": pa.array([f"p{i}" for i in rows_id]),
            "commit": pa.array(["c" * 40] * len(rows_id)),
            "lang": pa.array(["py"] * len(rows_id)),
            "content": pa.array(rows_content),
        }
    )
    return tbl, buckets


def test_bucket_separation(ray_session, planted):
    import ray.data

    from raydedup.pipeline import dedup_clusters

    tbl, buckets = planted
    out = dedup_clusters(
        ray.data.from_arrow(tbl), CFG, with_substring=False
    ).to_pandas()
    lab = dict(zip(out["id"], out["cluster_id"]))

    def together(bucket):
        pairs = buckets[bucket]
        return sum(1 for a, b, _ in pairs if lab[a] == lab[b]) / len(pairs)

    # high buckets must cluster (threshold 0.75). The mutation loop can
    # overshoot below the nominal bucket, so gate on the RECORDED true J:
    # P(band miss) at J >= 0.9 is < 0.1% — every such pair must cluster;
    # at J in [0.8, 0.9) allow the S-curve's few-percent miss rate.
    strong = [(a, b) for t in (0.97, 0.9, 0.8) for a, b, j in buckets[t] if j >= 0.9]
    assert strong and all(lab[a] == lab[b] for a, b in strong)
    mid = [(a, b) for t in (0.9, 0.8) for a, b, j in buckets[t] if 0.78 <= j < 0.9]
    if mid:
        hit = sum(1 for a, b in mid if lab[a] == lab[b])
        assert hit / len(mid) >= 0.85
    # false-positive control: J≈0.6 pairs are below threshold and must NOT
    # cluster (verification rejects them even when LSH proposes them)
    fp = buckets[0.6]
    true_js = [j for _, _, j in fp]
    assert max(true_js) < 0.72
    assert together(0.6) == 0.0


def test_kmv_jaccard_many_matches_scalar():
    """Vectorized block kernel must equal the scalar reference pairwise,
    across exact/estimation mode, disjoint/overlapping and empty sketches."""
    import numpy as np

    from raydedup.kmv import MAX_THETA
    from raydedup.stages import _kmv_jaccard_fast, kmv_jaccard_many

    rng = np.random.default_rng(42)
    k = 32
    sketches = []
    for i in range(40):
        n = int(rng.integers(0, 70))
        h = np.unique(rng.integers(0, 2**62, size=n, dtype=np.uint64))
        h.sort()
        if len(h) > k:
            theta = h[k]
            h = h[:k]
        else:
            theta = np.uint64(MAX_THETA)
        # overlapping families: reuse half of a previous sketch sometimes
        if i % 3 == 0 and sketches:
            prev = sketches[-1][1]
            h = np.unique(np.concatenate([h[: len(h) // 2], prev[: len(prev) // 2]]))
            h = h[h < theta][:k]
        sketches.append((theta, h))

    flat = np.concatenate([h for _, h in sketches]) if sketches else np.zeros(0, np.uint64)
    lens = np.array([len(h) for _, h in sketches], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    thetas = np.array([t for t, _ in sketches], dtype=np.uint64)

    ia, ib = np.triu_indices(len(sketches), k=1)
    got = kmv_jaccard_many(
        flat, off[ia], off[ia + 1], thetas[ia],
        flat, off[ib], off[ib + 1], thetas[ib], k,
    )
    for p in range(len(ia)):
        want = _kmv_jaccard_fast(
            thetas[ia[p]], sketches[ia[p]][1],
            thetas[ib[p]], sketches[ib[p]][1], k,
        )
        assert got[p] == want, (p, got[p], want)
