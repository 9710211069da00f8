"""Distributed trainable quality classifier: fixed-point logistic
regression over a vector column.

The CCNet/fastText-style pipeline stage the reference library has no
analogue for: train a linear classifier on labeled examples, then score
the whole corpus map-side (the quality-filter shape used on CommonCrawl).
Training is full-batch gradient descent where EVERY cross-row sum is an
integer, so the distributed result is bit-identical no matter how Ray
blocks or combines partials — and a chained-CTE DuckDB oracle can replay
the whole training loop (the same determinism contract as
raydedup/cluster.py and the quantized-cosine ANN stack).

Fixed-point scheme (all documented scales are powers of two, so every
rescale is an exact float64 operation):
* features  x_q = floor(x * 2^20)            (embed.quantize)
* weights   w_q = floor(w * 2^24), bias b_q = floor(b * 2^24)
* margin    z_int = sum_d x_q[d] * w_q[d] + b_q * 2^20   (exact int,
            |z_int| < 2^52 while |w| <= 8 and dim <= 256)
* link      p = clip(z/4 + 0.5, 0, 1) with z = z_int / 2^44 — the
            hard-sigmoid surrogate (piecewise-linear logistic, the same
            link quantized training systems use); every op is exact or
            correctly rounded identically in numpy and SQL
* residual  r_q = floor((p - y) * 2^24)      (int in [-2^24, 2^24])
* gradient  G_d = sum_i x_q[i,d] * r_q[i], G_b = sum_i r_q[i] — integer
            sums, accumulated per block in int64 and merged as Python
            ints (arbitrary precision: exact at any corpus size)
* update    w_q <- floor(w_q - lr * G_d / (n * 2^20)),
            b_q <- floor(b_q - lr * G_b / n)

Scale shape (100 TB): each iteration is ONE streaming pass — per-block
partials are (dim+2) integers combined by Ray's aggregate combiner tree;
weights are broadcast once per iteration via ``ray.put``; scoring is a
stateless map_batches against the broadcast weights.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from .cluster import quantized_matrix

W_SCALE = 16777216.0  # 2^24
X_SCALE = 1048576.0  # 2^20
Z_SCALE = W_SCALE * X_SCALE  # 2^44

# per-term gradient bound |x_q * r| <= 2^44, so int64 matmuls are exact
# only up to 2^18 rows at a time — Ray's default 128 MiB blocks hold far
# more rows for low-dim vectors, so blocks are folded in enforced chunks
GRAD_ROW_CHUNK = 1 << 18


def _forward_resid(
    xq: np.ndarray, y: np.ndarray, w_q: np.ndarray, b_q: int
) -> np.ndarray:
    """Quantized residuals r_q for one block (exact integers)."""
    z_int = xq.astype(np.int64) @ w_q.astype(np.int64) + np.int64(b_q) * np.int64(
        2**20
    )
    z = z_int.astype(np.float64) / Z_SCALE  # exact: power-of-two scale
    p = np.clip(0.25 * z + 0.5, 0.0, 1.0)  # hard sigmoid
    return np.floor((p - y.astype(np.float64)) * W_SCALE).astype(np.int64)


def _grad_aggregate(col: str, label_col: str, w_ref, dim: int):
    """AggregateFn carrying exact integer gradient sums (Python ints in
    the merged state — no overflow at any scale; int64 inside one block,
    safe while block_rows * 2^44 < 2^63)."""
    import ray
    from ray.data.aggregate import AggregateFn

    def _w():
        got = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
        return got

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        g, gb, n = (
            pickle.loads(state) if state else ([0] * dim, 0, 0)
        )
        if block.num_rows:
            w_q, b_q = _w()
            xq = quantized_matrix(block, col).astype(np.int64)
            y = block.column(label_col).to_numpy().astype(np.int64)
            r = _forward_resid(xq, y, w_q, b_q)
            for c0 in range(0, len(r), GRAD_ROW_CHUNK):
                c1 = c0 + GRAD_ROW_CHUNK
                gd = xq[c0:c1].T @ r[c0:c1]  # int64-exact: <=2^18 * 2^44
                g = [int(a) + int(b) for a, b in zip(g, gd)]
                gb += int(r[c0:c1].sum())
            n += len(r)
        return pickle.dumps((g, gb, n))

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(([0] * dim, 0, 0))
        if not b:
            return a
        ga, gba, na = pickle.loads(a)
        gb_, gbb, nb = pickle.loads(b)
        return pickle.dumps(
            ([x + y for x, y in zip(ga, gb_)], gba + gbb, na + nb)
        )

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s,
        name="logreg_grad",
    )


def train_logreg(
    ds,
    col: str = "embedding",
    label_col: str = "y",
    n_iter: int = 4,
    lr: float = 0.5,
    dim: int | None = None,
) -> tuple[np.ndarray, int]:
    """Fixed-point full-batch gradient descent from zero init; returns
    (w_q int64 (dim,), b_q int). ``label_col`` must be 0/1 integers.

    Deterministic by construction: gradients are exact integer sums, the
    update is one float64 expression per weight — block layout, combiner
    order and cluster size cannot change the result (pytest-checked
    block-invariance; the SQL oracle replays the loop)."""
    import ray

    if dim is None:
        first = ds.take(1)
        if not first:
            raise ValueError("empty dataset")
        dim = len(first[0][col])
    w_q = np.zeros(dim, dtype=np.int64)
    b_q = 0
    for _ in range(n_iter):
        ref = ray.put((w_q, b_q))
        state = ds.aggregate(_grad_aggregate(col, label_col, ref, dim))[
            "logreg_grad"
        ]
        g, gb, n = pickle.loads(state)
        if n == 0:
            raise ValueError("no rows")
        g_arr = np.array([float(x) for x in g], dtype=np.float64)
        w_q = np.floor(
            w_q.astype(np.float64) - lr * (g_arr / (n * X_SCALE))
        ).astype(np.int64)
        b_q = int(np.floor(b_q - lr * (float(gb) / n)))
        if np.abs(w_q).max() >= 2**27 or abs(b_q) >= 2**27:
            raise ValueError(
                "weights left the exactness envelope (|w| >= 8); lower lr"
            )
    return w_q, b_q


def logreg_scores(
    ds,
    w_q: np.ndarray,
    b_q: int,
    col: str = "embedding",
    id_col: str = "vec_id",
):
    """(id_col, z, pred) — z is the exact integer margin (z_int; positive
    means p > 0.5), pred the boolean decision. Weights broadcast once."""
    import ray

    ref = ray.put((np.asarray(w_q, dtype=np.int64), int(b_q)))

    def fn(batch: pa.Table) -> pa.Table:
        w, b = ray.get(ref)
        if not batch.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "z": pa.array([], pa.int64()),
                    "pred": pa.array([], pa.bool_()),
                }
            )
        xq = quantized_matrix(batch, col).astype(np.int64)
        z = xq @ w + np.int64(b) * np.int64(2**20)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "z": pa.array(z, pa.int64()),
                "pred": pa.array(z > 0),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
