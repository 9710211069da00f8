"""Product quantization (raydedup/pq.py) vs scalar references + ADC recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.embed import quantize
from raydedup.pq import pq_adc_topk, pq_encode, pq_train


def _fixture(n=300, dim=16, n_blobs=6, seed=19):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, dim)) * 0.3
    vecs = centers[np.arange(n) % n_blobs] + rng.normal(size=(n, dim)) * 0.03
    return np.clip(vecs, -0.99, 0.99).astype(np.float32)


def _ds(ray, vecs, blocks=7):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs.astype(float))),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _scalar_codes(vecs, books):
    qm = quantize(vecs.astype(np.float64))
    m, _, dsub = books.shape
    codes = np.empty((len(qm), m), dtype=np.int64)
    for j in range(m):
        sub = qm[:, j * dsub : (j + 1) * dsub]
        c = books[j]
        d = (
            (sub * sub).sum(axis=1)[:, None]
            - 2.0 * (sub @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        codes[:, j] = np.argmin(d, axis=1)
    return codes


def test_train_matches_per_subspace_kmeans(ray_session):
    from raydedup.cluster import kmeans_fit

    vecs = _fixture(n=200, dim=8)
    ds = _ds(ray_session, vecs)
    books = pq_train(ds, m=2, k_codes=4, n_iter=2)
    assert books.shape == (2, 4, 4)
    # subspace 0 codebook == kmeans_fit on the sliced vectors
    sub = _ds(ray_session, vecs[:, :4])
    ref = kmeans_fit(sub, k=4, n_iter=2)
    assert np.array_equal(books[0], ref)


def test_encode_matches_scalar_and_is_block_invariant(ray_session):
    vecs = _fixture()
    ds = _ds(ray_session, vecs)
    books = pq_train(ds, m=4, k_codes=8, n_iter=2)
    ref = _scalar_codes(vecs, books)
    for blocks in (1, 9):
        out = (
            pq_encode(_ds(ray_session, vecs, blocks), books)
            .to_pandas()
            .sort_values("vec_id")
        )
        got = np.stack(out["codes"].to_numpy())
        assert np.array_equal(got, ref)


def test_adc_topk_recall_vs_exact(ray_session):
    vecs = _fixture(n=400, dim=16, n_blobs=8, seed=5)
    ds = _ds(ray_session, vecs)
    books = pq_train(ds, m=8, k_codes=16, n_iter=4)
    encoded = pq_encode(ds, books).materialize()
    q = vecs[:5].astype(np.float64)
    out = pq_adc_topk(encoded, books, q, np.arange(5), k=10).to_pandas()
    # exact L2 top-k ground truth on the quantized grid
    # PQ is coarse-lossy: assert the guarantees ADC actually provides —
    # every hit comes from the query's blob, the query's own vector is
    # retrieved, and distances ascend per query
    blobs = np.arange(400) % 8
    self_hits = 0
    for qi in range(5):
        hits = out[out["query_id"] == qi]["vec_id"].to_numpy()
        assert len(hits) == 10
        assert (blobs[hits] == blobs[qi]).mean() >= 0.9, qi
        self_hits += int(qi in set(hits))
        dv = out[out["query_id"] == qi]["adc_dist"].to_numpy()
        assert (np.diff(dv) >= 0).all()
    assert self_hits >= 4
    # and fine recall@10 vs exact recovers as the codebook grows
    books_big = pq_train(ds, m=8, k_codes=64, n_iter=4)
    enc_big = pq_encode(ds, books_big).materialize()
    out_big = pq_adc_topk(enc_big, books_big, q, np.arange(5), k=10).to_pandas()
    qm = quantize(vecs.astype(np.float64))
    qq = quantize(q)
    rec_small, rec_big = [], []
    for qi in range(5):
        d = ((qm - qq[qi]) ** 2).sum(axis=1)
        truth = set(np.argsort(d, kind="stable")[:10])
        rec_small.append(
            len(set(out[out["query_id"] == qi]["vec_id"]) & truth) / 10
        )
        rec_big.append(
            len(set(out_big[out_big["query_id"] == qi]["vec_id"]) & truth) / 10
        )
    assert np.mean(rec_big) >= np.mean(rec_small)
    assert np.mean(rec_big) >= 0.6, (rec_small, rec_big)


def test_compression_ratio_and_self_code(ray_session):
    """Every codebook centroid encodes to its own code (distance 0)."""
    vecs = _fixture(n=64, dim=8)
    ds = _ds(ray_session, vecs)
    books = pq_train(ds, m=2, k_codes=4, n_iter=3)
    # float64 end-to-end: q/2^20 needs >24 mantissa bits, float32 would
    # perturb the round-trip
    cent_vecs = np.concatenate([books[0], books[1]], axis=1) / 1048576.0
    out = (
        pq_encode(_ds(ray_session, cent_vecs), books)
        .to_pandas()
        .sort_values("vec_id")
    )
    codes = np.stack(out["codes"].to_numpy())
    assert np.array_equal(codes[:, 0], np.arange(4) % 4)
    assert np.array_equal(codes[:, 1], np.arange(4) % 4)


def test_bad_dim_raises(ray_session):
    vecs = _fixture(n=30, dim=10)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(_ds(ray_session, vecs), m=3, k_codes=2, n_iter=1)
