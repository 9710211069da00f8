"""Fixed-point distributed logistic regression (raydedup/classifier.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.classifier import (
    W_SCALE,
    X_SCALE,
    Z_SCALE,
    logreg_scores,
    train_logreg,
)
from raydedup.embed import quantize


def _scalar_train(vecs, y, n_iter, lr):
    """Single-process replay of the documented fixed-point GD."""
    xq = quantize(vecs.astype(np.float64)).astype(np.int64)
    dim = xq.shape[1]
    w_q = np.zeros(dim, dtype=np.int64)
    b_q = 0
    n = len(y)
    for _ in range(n_iter):
        z = xq @ w_q + b_q * 2**20
        p = np.clip(0.25 * (z / Z_SCALE) + 0.5, 0, 1)
        r = np.floor((p - y) * W_SCALE).astype(np.int64)
        g = xq.T @ r
        w_q = np.floor(w_q - lr * (g.astype(np.float64) / (n * X_SCALE))).astype(
            np.int64
        )
        b_q = int(np.floor(b_q - lr * (float(r.sum()) / n)))
    return w_q, b_q


def _fixture(n=300, dim=12, seed=5):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(size=dim)
    x = rng.normal(size=(n, dim)) * 0.25
    y = (x @ w_true > 0).astype(np.int64)
    return np.clip(x, -0.99, 0.99).astype(np.float32), y


def _ds(ray, vecs, y, blocks=7):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs.astype(float))),
            "y": pa.array(y, pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def test_train_matches_scalar_reference(ray_session):
    vecs, y = _fixture()
    w_q, b_q = train_logreg(_ds(ray_session, vecs, y), n_iter=3, lr=0.5)
    rw, rb = _scalar_train(vecs, y, 3, 0.5)
    assert np.array_equal(w_q, rw) and b_q == rb


def test_block_shape_invariance(ray_session):
    vecs, y = _fixture(n=150, dim=6)
    r1 = train_logreg(_ds(ray_session, vecs, y, blocks=1), n_iter=2, lr=0.5)
    r13 = train_logreg(_ds(ray_session, vecs, y, blocks=13), n_iter=2, lr=0.5)
    assert np.array_equal(r1[0], r13[0]) and r1[1] == r13[1]


def test_classifier_learns_separable(ray_session):
    vecs, y = _fixture(n=400, dim=12, seed=9)
    ds = _ds(ray_session, vecs, y)
    w_q, b_q = train_logreg(ds, n_iter=12, lr=1.0)
    out = logreg_scores(ds, w_q, b_q).to_pandas().sort_values("vec_id")
    acc = (out["pred"].to_numpy() == (y == 1)).mean()
    assert acc >= 0.9, acc
    # z is the exact integer margin; pred is its sign
    assert np.array_equal(out["pred"].to_numpy(), out["z"].to_numpy() > 0)


def test_exactness_envelope_guard(ray_session):
    vecs, y = _fixture(n=50, dim=4)
    with pytest.raises(ValueError, match="exactness envelope"):
        train_logreg(_ds(ray_session, vecs, y), n_iter=200, lr=1e4)


def test_empty_dataset_raises(ray_session):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
            "y": pa.array([], pa.int64()),
        }
    )
    with pytest.raises(ValueError):
        train_logreg(ray.data.from_arrow(t))


def test_grad_chunking_exact(monkeypatch):
    """The per-block int64 fold is chunk-size-invariant (the 2^18 guard):
    driving the aggregate's acc directly in-process with a tiny chunk."""
    import pickle

    import raydedup.classifier as cl

    vecs, y = _fixture(n=53, dim=5, seed=2)
    xq = quantize(vecs.astype(np.float64)).astype(np.int64)
    w_q = np.arange(5, dtype=np.int64) * 1000 - 2000
    b_q = 37
    t = pa.table(
        {
            "embedding": pa.array(list(vecs.astype(float))),
            "y": pa.array(y, pa.int64()),
        }
    )
    ref_state = cl._grad_aggregate("embedding", "y", (w_q, b_q), 5).accumulate_block(
        None, t
    )
    monkeypatch.setattr(cl, "GRAD_ROW_CHUNK", 7)
    chunked = cl._grad_aggregate("embedding", "y", (w_q, b_q), 5).accumulate_block(
        None, t
    )
    assert pickle.loads(ref_state) == pickle.loads(chunked)
    # and matches the direct integer expression
    r = cl._forward_resid(xq, y.astype(np.int64), w_q, b_q)
    g, gb, n = pickle.loads(chunked)
    assert g == [int(v) for v in (xq.T @ r)]
    assert gb == int(r.sum()) and n == 53
