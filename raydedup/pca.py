"""Distributed exact moment accumulation + PCA/whitening projection over a
vector column.

The standard pre-ANN / pre-clustering embedding conditioning stage (center,
decorrelate, optionally whiten) expressed Ray-Data-first: ONE streaming
pass accumulates the exact integer first- and second-moment matrices of the
2^20-quantized vectors (vectorized int64 partials through Ray's combiner
tree, promoted to arbitrary-precision Python ints at the int64 envelope —
exact at any corpus size, the raydedup/classifier.py contract), the tiny
(dim x dim)
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

from .cluster import matrix_list_array, quantized_matrix
from .embed import QUANT_SCALE


# int64 fast path bounds: per-chunk second-moment partial <= 2^20 rows x
# 2^40 = 2^60; two addends each < 2^61 cannot overflow int64; promotion to
# Python ints keeps exactness beyond that (reachable only past ~2 x 10^6
# near-full-scale rows per accumulator lineage)
_PROMOTE = 1 << 61
_ROW_CHUNK = 1 << 20


def _moment_aggregate(col: str, dim: int):
    """AggregateFn carrying (sum_x, sum_xxT upper triangle, n) — int64
    numpy state on the hot path (one vectorized add per block, no
    per-entry Python), promoted to arbitrary-precision Python ints the
    moment any entry nears the int64 envelope."""
    from ray.data.aggregate import AggregateFn

    tri = dim * (dim + 1) // 2
    iu = np.triu_indices(dim)

    def _zero() -> tuple:
        return ("i64", np.zeros(dim, np.int64), np.zeros(tri, np.int64), 0)

    def _add(state: tuple, s2, ss2, n2: int) -> tuple:
        kind, s, ss, n = state
        if kind == "i64" and isinstance(s2, np.ndarray):
            ns, nss = s + s2, ss + ss2
            if (
                np.abs(ns).max(initial=0) < _PROMOTE
                and np.abs(nss).max(initial=0) < _PROMOTE
            ):
                return ("i64", ns, nss, n + n2)
            # near the envelope: redo the add in Python ints
            s, ss = [int(v) for v in s], [int(v) for v in ss]
            kind = "obj"
        if isinstance(s2, np.ndarray):
            s2, ss2 = [int(v) for v in s2], [int(v) for v in ss2]
        if kind == "i64":
            s, ss = [int(v) for v in s], [int(v) for v in ss]
        return (
            "obj",
            [a + b for a, b in zip(s, s2)],
            [a + b for a, b in zip(ss, ss2)],
            n + n2,
        )

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        st = pickle.loads(state) if state else _zero()
        if block.num_rows:
            xq = quantized_matrix(block, col).astype(np.int64)
            for c0 in range(0, len(xq), _ROW_CHUNK):
                chunk = xq[c0 : c0 + _ROW_CHUNK]
                # int64-exact per chunk: <= 2^20 rows x 2^40 per entry
                st = _add(
                    st, chunk.sum(axis=0), (chunk.T @ chunk)[iu], len(chunk)
                )
        return pickle.dumps(st)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(_zero())
        if not b:
            return a
        sa = pickle.loads(a)
        _, sb_s, sb_ss, sb_n = pickle.loads(b)
        return pickle.dumps(_add(sa, sb_s, sb_ss, sb_n))

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s,
        name="pca_moments",
    )


def vector_moments_exact(
    ds, col: str = "embedding", dim: int | None = None
) -> tuple[list[int], list[int], int]:
    """Exact arbitrary-precision integer moments of the quantized vectors
    in ONE streaming pass: (sum_x [dim], upper-triangle sum_xxT
    [dim*(dim+1)/2] row-major, n) as Python ints — bit-exact at any corpus
    size (the embedding_covariance oracle consumes THIS form, so no
    float53 rounding sits between the engine and DuckDB's HUGEINT sums)."""
    if dim is None:
        first = ds.take(1)
        if not first:
            raise ValueError("empty dataset")
        dim = len(first[0][col])
    state = ds.aggregate(_moment_aggregate(col, dim))["pca_moments"]
    _, s, ss, n = pickle.loads(state)
    return [int(v) for v in s], [int(v) for v in ss], n


def vector_moments(
    ds, col: str = "embedding", dim: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Float64 view of vector_moments_exact: (sum_x (dim,), sum_xxT
    (dim, dim) symmetric, n). Exact while entries stay < 2^53; beyond
    that the conversion rounds to the nearest double (fine for fit_pca's
    covariance — ulp-level — NOT fine for bit-exact consumers: use
    vector_moments_exact)."""
    s, ss, n = vector_moments_exact(ds, col, dim)
    dim = len(s)
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
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "projected": pa.array([], pa.list_(pa.float64())),
                }
            )
        x = quantized_matrix(batch, col) / QUANT_SCALE
        proj = (x - mean) @ comps.T * scale
        return pa.table(
            {
                id_col: batch.column(id_col),
                "projected": matrix_list_array(proj),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
