"""Distributed exact moments + PCA (raydedup/pca.py) vs numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.embed import QUANT_SCALE, quantize
from raydedup.pca import fit_pca, pca_project, vector_moments


def _fixture(n=400, dim=10, seed=13):
    rng = np.random.default_rng(seed)
    # anisotropic: two dominant directions
    basis = rng.normal(size=(dim, dim))
    x = rng.normal(size=(n, dim)) * np.linspace(2.0, 0.1, dim)
    return np.clip((x @ basis) * 0.05, -0.99, 0.99).astype(np.float32)


def _ds(ray, vecs, blocks=7):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs.astype(float))),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def test_moments_exact_and_block_invariant(ray_session):
    vecs = _fixture()
    qm = quantize(vecs.astype(np.float64)).astype(np.int64)
    ref_s = qm.sum(axis=0)
    ref_m = qm.T @ qm
    for blocks in (1, 11):
        s, m, n = vector_moments(_ds(ray_session, vecs, blocks))
        assert n == len(vecs)
        assert np.array_equal(s, ref_s.astype(np.float64))
        assert np.array_equal(m, ref_m.astype(np.float64))


def test_fit_pca_matches_numpy(ray_session):
    vecs = _fixture(n=500, dim=8, seed=3)
    basis = fit_pca(_ds(ray_session, vecs), n_components=4)
    # numpy reference on the SAME quantized representation
    x = quantize(vecs.astype(np.float64)) / QUANT_SCALE
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    assert np.allclose(basis["eigenvalues"], evals[order], rtol=1e-9, atol=1e-15)
    for r, c in enumerate(order):
        v = evecs[:, c]
        j = int(np.argmax(np.abs(basis["components"][r])))
        if v[j] * basis["components"][r][j] < 0:
            v = -v
        assert np.allclose(basis["components"][r], v, atol=1e-9)


def test_project_decorrelates_and_whitens(ray_session):
    vecs = _fixture(n=600, dim=8, seed=21)
    ds = _ds(ray_session, vecs)
    basis = fit_pca(ds, n_components=3, whiten=True)
    out = pca_project(ds, basis).to_pandas().sort_values("vec_id")
    proj = np.stack(out["projected"].to_numpy())
    assert proj.shape == (600, 3)
    cov = np.cov(proj.T, bias=True)
    # whitened: identity covariance
    assert np.allclose(cov, np.eye(3), atol=1e-6)
    # variance ordering without whitening
    basis2 = fit_pca(ds, n_components=3, whiten=False)
    p2 = np.stack(
        pca_project(ds, basis2).to_pandas().sort_values("vec_id")["projected"].to_numpy()
    )
    var = p2.var(axis=0)
    assert var[0] >= var[1] >= var[2]


def test_empty_and_tiny_raise(ray_session):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array([[0.1, 0.2]], pa.list_(pa.float64())),
        }
    )
    with pytest.raises(ValueError):
        fit_pca(ray.data.from_arrow(t), n_components=1)


def test_moment_state_promotion_exact(monkeypatch):
    """Forcing a tiny int64 envelope promotes the combiner state to Python
    ints without changing any value (exactness across the promotion)."""
    import pickle

    import raydedup.pca as pcamod

    vecs = _fixture(n=60, dim=4, seed=8)
    t = pa.table({"embedding": pa.array(list(vecs.astype(float)))})
    agg_ref = pcamod._moment_aggregate("embedding", 4)
    st_ref = pickle.loads(agg_ref.accumulate_block(None, t))
    monkeypatch.setattr(pcamod, "_PROMOTE", 1)
    agg = pcamod._moment_aggregate("embedding", 4)
    half1, half2 = t.slice(0, 30), t.slice(30)
    a = agg.accumulate_block(None, half1)
    b = agg.accumulate_block(None, half2)
    st = pickle.loads(agg.merge(a, b))
    assert st[0] == "obj"  # promoted
    assert [int(v) for v in st[1]] == [int(v) for v in st_ref[1]]
    assert [int(v) for v in st[2]] == [int(v) for v in st_ref[2]]
    assert st[3] == st_ref[3] == 60
