"""Distributed exact moment accumulation + PCA/whitening projection over a
vector column.

The standard pre-ANN / pre-clustering embedding conditioning stage (center,
decorrelate, optionally whiten) expressed Ray-Data-first: ONE streaming
pass accumulates the exact integer first- and second-moment matrices of the
2^20-quantized vectors (per-block int64 partials, merged as
arbitrary-precision Python ints through Ray's combiner tree — exact at any
corpus size, the raydedup/classifier.py contract), the tiny (dim x dim)
eigendecomposition happens on the driver, and the projection is a
stateless map_batches against the broadcast basis.

Determinism: the moment matrices are bit-exact whatever the block layout
(integer sums — the `embedding_covariance` driver query is value-hash
oracled against DuckDB HUGEINT sums). The eigendecomposition itself is
LAPACK-iterative and NOT SQL-expressible; `fit_pca` is pytest-checked
against numpy on the same exact moments instead (the same split as
kmeans_fit: exact distributed statistics + a small driver-side solve).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from .cluster import quantized_matrix
from .embed import QUANT_SCALE


def _moment_aggregate(col: str, dim: int):
    """AggregateFn carrying (sum_x int, sum_xxT int upper triangle, n)."""
    from ray.data.aggregate import AggregateFn

    tri = dim * (dim + 1) // 2

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        s, ss, n = (
            pickle.loads(state) if state else ([0] * dim, [0] * tri, 0)
        )
        if block.num_rows:
            xq = quantized_matrix(block, col).astype(np.int64)
            bs = xq.sum(axis=0)  # |sum| <= 2^20 * block_rows — int64-safe
            # second moment: int64-exact while block_rows * 2^40 < 2^63
            m = xq.T @ xq
            iu = np.triu_indices(dim)
            s = [int(a) + int(b) for a, b in zip(s, bs)]
            ss = [int(a) + int(b) for a, b in zip(ss, m[iu])]
            n += block.num_rows
        return pickle.dumps((s, ss, n))

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(([0] * dim, [0] * tri, 0))
        if not b:
            return a
        sa, ssa, na = pickle.loads(a)
        sb, ssb, nb = pickle.loads(b)
        return pickle.dumps(
            (
                [x + y for x, y in zip(sa, sb)],
                [x + y for x, y in zip(ssa, ssb)],
                na + nb,
            )
        )

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s,
        name="pca_moments",
    )


def vector_moments(
    ds, col: str = "embedding", dim: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact integer moments of the quantized vectors in ONE streaming
    pass: (sum_x (dim,), sum_xxT (dim, dim) symmetric, n). Values are
    float64 holding exact integers while they stay < 2^53 (2^40-scale
    second moments x up to ~8k rows; beyond that the Python-int combiner
    state is still exact — convert with care)."""
    if dim is None:
        first = ds.take(1)
        if not first:
            raise ValueError("empty dataset")
        dim = len(first[0][col])
    state = ds.aggregate(_moment_aggregate(col, dim))["pca_moments"]
    s, ss, n = pickle.loads(state)
    sum_x = np.array([float(v) for v in s])
    m = np.zeros((dim, dim))
    iu = np.triu_indices(dim)
    m[iu] = [float(v) for v in ss]
    m = m + np.triu(m, 1).T
    return sum_x, m, n


def fit_pca(
    ds,
    n_components: int,
    col: str = "embedding",
    dim: int | None = None,
    whiten: bool = False,
    eps: float = 1e-9,
) -> dict:
    """PCA basis from the exact distributed moments. Returns
    {mean (dim,), components (n_components, dim) row-major descending
    eigenvalue, scale (n_components,)} in ORIGINAL (unquantized) units."""
    sum_x, m, n = vector_moments(ds, col, dim)
    if n < 2:
        raise ValueError("need at least 2 rows")
    mean_q = sum_x / n
    # covariance of quantized coords; /QUANT_SCALE^2 returns original units
    cov = (m / n - np.outer(mean_q, mean_q)) / (QUANT_SCALE * QUANT_SCALE)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    # deterministic sign: largest-|coeff| entry of each component positive
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    scale = (
        1.0 / np.sqrt(np.maximum(evals[order], eps))
        if whiten
        else np.ones(len(order))
    )
    return {
        "mean": mean_q / QUANT_SCALE,
        "components": comps,
        "scale": scale,
        "eigenvalues": evals[order],
        "n": n,
    }


def pca_project(
    ds, basis: dict, col: str = "embedding", id_col: str = "vec_id"
):
    """(id_col, projected list<double>) — stateless map against the
    broadcast basis: (x - mean) @ components.T * scale."""
    import ray

    ref = ray.put(
        (
            np.asarray(basis["mean"], np.float64),
            np.asarray(basis["components"], np.float64),
            np.asarray(basis["scale"], np.float64),
        )
    )

    def fn(batch: pa.Table) -> pa.Table:
        mean, comps, scale = ray.get(ref)
        if not batch.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "projected": pa.array([], pa.list_(pa.float64())),
                }
            )
        x = quantized_matrix(batch, col) / QUANT_SCALE
        proj = (x - mean) @ comps.T * scale
        return pa.table(
            {
                id_col: batch.column(id_col),
                "projected": pa.array(list(proj)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
