"""Distributed k-means + SemDeDup (raydedup/cluster.py) vs scalar references."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.cluster import (
    _assign,
    _semdedup_cluster_kept,
    kmeans_assign,
    kmeans_fit,
    semdedup,
    smallest_k_rows,
)
from raydedup.embed import quantize


def _fixture(n=400, dim=16, n_blobs=5, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, dim)) * 0.3
    vecs = centers[np.arange(n) % n_blobs] + rng.normal(size=(n, dim)) * 0.02
    vecs = np.clip(vecs, -0.99, 0.99).astype(np.float32)
    return vecs


def _scalar_kmeans(vecs, k, n_iter):
    """Single-process reference replaying the documented algorithm:
    quantized vectors, prototype init (k smallest ids), exact integer
    squared-L2 argmin with lowest-cluster ties, floor(sum/count) update,
    empty clusters keep their centroid."""
    qm = quantize(vecs.astype(np.float64))
    cent = qm[:k].copy()  # ids are 0..n-1 in the fixture
    for _ in range(n_iter):
        d = (
            (qm * qm).sum(axis=1)[:, None]
            - 2.0 * (qm @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        a = np.argmin(d, axis=1)
        new = cent.copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = np.floor(qm[m].sum(axis=0) / m.sum())
        cent = new
    d = (
        (qm * qm).sum(axis=1)[:, None]
        - 2.0 * (qm @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return cent, np.argmin(d, axis=1)


def _ds(ray, vecs, blocks=7):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs.astype(float))),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def test_kmeans_fit_matches_scalar_reference(ray_session):
    vecs = _fixture()
    ds = _ds(ray_session, vecs)
    cent = kmeans_fit(ds, k=5, n_iter=3)
    ref_cent, ref_assign = _scalar_kmeans(vecs, 5, 3)
    # bit-exact: every sum in the distributed path is integer-exact, so
    # block boundaries and combiner order cannot change the result
    assert np.array_equal(cent, ref_cent)
    out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    assert np.array_equal(out["cluster"].to_numpy(), ref_assign)


def test_kmeans_block_shape_invariance(ray_session):
    vecs = _fixture(n=150, dim=8, n_blobs=3)
    c1 = kmeans_fit(_ds(ray_session, vecs, blocks=1), k=3, n_iter=2)
    c2 = kmeans_fit(_ds(ray_session, vecs, blocks=13), k=3, n_iter=2)
    assert np.array_equal(c1, c2)


def test_kmeans_clusters_blobs(ray_session):
    """Lloyd's on well-separated blobs recovers the planted partition."""
    vecs = _fixture(n=300, dim=16, n_blobs=4, seed=11)
    ds = _ds(ray_session, vecs)
    cent = kmeans_fit(ds, k=4, n_iter=8)
    a = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    planted = np.arange(300) % 4
    # same-blob rows co-cluster: cluster label is a pure function of blob
    for b in range(4):
        assert len(np.unique(a[planted == b])) == 1
    assert len(np.unique(a)) == 4


def test_smallest_k_rows(ray_session):
    vecs = _fixture(n=50, dim=4)
    ds = _ds(ray_session, vecs, blocks=9)
    got = smallest_k_rows(ds, 6, "vec_id", "embedding")
    assert np.array_equal(got, quantize(vecs[:6].astype(np.float64)))


def _scalar_semdedup_dominance(qm, ids, c, thr):
    norms = np.sqrt((qm * qm).sum(axis=1))
    norms[norms == 0] = 1
    cn = np.sqrt((c * c).sum()) or 1.0
    s = (qm @ c) / (norms * cn)
    cos = (qm @ qm.T) / np.outer(norms, norms)
    n = len(ids)
    kept = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if cos[i, j] >= thr and (s[j], ids[j]) < (s[i], ids[i]):
                kept[i] = False
    return kept


def test_semdedup_cluster_kept_matches_bruteforce():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(12, 8))
    # plant near-dup pairs: rows 12..17 are tiny perturbations of rows 0..5
    dups = base[:6] + rng.normal(size=(6, 8)) * 1e-3
    m = quantize(np.vstack([base, dups]) * 0.1)
    ids = np.arange(len(m), dtype=np.int64)
    c = np.floor(m.mean(axis=0))
    for thr in (0.9, 0.99, 0.5):
        got = _semdedup_cluster_kept(m, ids, c, thr, "dominance", chunk_rows=4096)
        ref = _scalar_semdedup_dominance(m, ids, c, thr)
        assert np.array_equal(got, ref), thr
        # chunked path agrees with the one-shot path
        got3 = _semdedup_cluster_kept(m, ids, c, thr, "dominance", chunk_rows=3)
        assert np.array_equal(got3, ref), thr


def test_semdedup_greedy_keeps_superset():
    """Greedy (only survivors kill) keeps a superset of dominance and is
    chunk-invariant; on a transitive chain a--b--c (a~b, b~c, a!~c) greedy
    keeps {a, c} while dominance keeps only a."""
    # 1-D chain along an angle: cos(a,b) >= t, cos(b,c) >= t, cos(a,c) < t
    ang = np.array([0.0, 0.30, 0.60])
    m = quantize(np.stack([np.cos(ang), np.sin(ang)], axis=1) * 0.9)
    ids = np.arange(3, dtype=np.int64)
    c = quantize(np.array([[np.cos(0.0), np.sin(0.0)]]) * 0.9)[0]
    thr = np.cos(0.45)  # between cos(0.30) and cos(0.60)
    dom = _semdedup_cluster_kept(m, ids, c, thr, "dominance", 4096)
    gre = _semdedup_cluster_kept(m, ids, c, thr, "greedy", 4096)
    assert dom.sum() <= gre.sum()
    assert set(np.flatnonzero(gre)) >= set(np.flatnonzero(dom))
    for chunk in (1, 2):
        assert np.array_equal(
            gre, _semdedup_cluster_kept(m, ids, c, thr, "greedy", chunk)
        )


def test_semdedup_pipeline_drops_planted_dups(ray_session):
    vecs = _fixture(n=200, dim=16, n_blobs=4, seed=23)
    # plant exact copies of the first 10 rows at new ids
    allv = np.vstack([vecs, vecs[:10]])
    ds = _ds(ray_session, allv)
    cent = kmeans_fit(ds, k=4, n_iter=4)
    out = semdedup(ds, cent, threshold=0.999).to_pandas().sort_values("vec_id")
    assert len(out) == len(allv)
    # each (original, copy) pair loses exactly one member
    kept = out.set_index("vec_id")["kept"]
    for i in range(10):
        assert int(kept[i]) + int(kept[200 + i]) == 1, i
    # distributed result == scalar dominance rule per cluster
    qm = quantize(allv.astype(np.float64))
    a = _assign(qm, cent)
    for cl in np.unique(a):
        m = a == cl
        ref = _scalar_semdedup_dominance(
            qm[m], np.flatnonzero(m).astype(np.int64), cent[cl], 0.999
        )
        got = kept[np.flatnonzero(m)].to_numpy()
        assert np.array_equal(got, ref)


def test_kmeans_bad_init_raises(ray_session):
    vecs = _fixture(n=20, dim=4)
    with pytest.raises(ValueError):
        kmeans_fit(_ds(ray_session, vecs), k=2, n_iter=1, init="bogus")


def test_semdedup_string_ids(ray_session):
    """Non-int64 id columns survive the whole path (review finding): the
    output preserves the arrow string type and the keep rule uses the ids'
    natural order as the tie-break."""
    import ray.data

    vecs = _fixture(n=40, dim=8, seed=31)
    allv = np.vstack([vecs, vecs[:5]])
    names = [f"doc-{i:03d}" for i in range(40)] + [f"dup-{i:03d}" for i in range(5)]
    t = pa.table(
        {
            "doc": pa.array(names),
            "embedding": pa.array(list(allv.astype(float))),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    cent = kmeans_fit(ds, k=2, n_iter=2, id_col="doc")
    out = (
        semdedup(ds, cent, threshold=0.999, id_col="doc")
        .to_pandas()
        .set_index("doc")
    )
    assert len(out) == 45 and out.index.dtype == object
    for i in range(5):
        a, b = f"doc-{i:03d}", f"dup-{i:03d}"
        assert out.loc[a, "cluster"] == out.loc[b, "cluster"]
        assert int(out.loc[a, "kept"]) + int(out.loc[b, "kept"]) == 1
