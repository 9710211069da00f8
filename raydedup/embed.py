"""Embedding similarity: brute-force cosine top-k + LSH-bucketed near-dup.

* ``ann_topk`` — baseline exact ANN: the (small) query matrix is broadcast
  once via ``ray.put`` and every map_batches task scores its batch against
  it with one float64 matmul (zero re-shipping per batch).
* ``random_hyperplane_buckets`` / ``embedding_dup_pairs`` — SimHash-for-
  vectors (Charikar random hyperplanes): bucket by sign pattern, verify
  cosine within buckets — the scale path for embedding near-dup detection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

# Embeddings are quantized to integers (floor(v * 2^20)) before cosine
# computation. Integer dot products and norms are exactly representable in
# float64 (|v| < 1, dim 64 → < 2^53), and the final
# dot / (sqrt(na) * sqrt(nb)) is a fixed sequence of correctly-rounded IEEE
# ops — so any engine (numpy, DuckDB, ...) computing this definition from
# the same inputs produces bit-identical cosines. That determinism is what
# lets the ANN operators carry exact value-hash oracles.
QUANT_SCALE = 1048576.0  # 2^20


def quantize(m: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(m, dtype=np.float64) * QUANT_SCALE)


def quantized_cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise cosine matrix between quantized row sets (bit-deterministic)."""
    qa, qb = quantize(a), quantize(b)
    dots = qa @ qb.T
    na = np.sqrt((qa * qa).sum(axis=1))
    nb = np.sqrt((qb * qb).sum(axis=1))
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    return dots / (na[:, None] * nb[None, :])


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(len(arr), 1)
    return flat.reshape(len(arr), dim)


class AnnScorer:
    """Actor-pool stage: scores batches against a broadcast query matrix."""

    def __init__(self, queries_ref, query_ids, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = np.asarray(q, dtype=np.float64)
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, "embedding")
        cos = quantized_cosine(m, self.q)  # (batch, nq)
        vec_ids = batch.column("vec_id").to_numpy()
        nq = cos.shape[1]
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.query_ids, len(vec_ids))),
                "vec_id": pa.array(np.tile(vec_ids, nq)),
                "cosine": pa.array(cos.T.reshape(-1)),
            }
        )


def ann_topk(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
) -> "ray.data.Dataset":
    """Exact top-k by cosine per query. Scoring is distributed; the final
    top-k cut is a per-query groupby (small: nq * n rows pre-cut is avoided
    by per-batch pre-cut to k)."""
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))

    scored = embeddings.map_batches(
        AnnScorer,
        fn_constructor_kwargs={"queries_ref": q_ref, "query_ids": query_ids, "k": k},
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=4096,
    )

    def topk_per_query(group: pa.Table) -> pa.Table:
        cos = group.column("cosine").to_numpy()
        vid = group.column("vec_id").to_numpy()
        # deterministic: cosine desc, vec_id asc tiebreak
        order = np.lexsort((vid, -cos))[:k]
        return pa.table(
            {
                "query_id": group.column("query_id").take(pa.array(order)),
                "vec_id": pa.array(vid[order]),
                "cosine": pa.array(cos[order]),
            }
        )

    return scored.groupby("query_id").map_groups(topk_per_query, batch_format="pyarrow")


class HyperplaneBucketStage:
    """vector → LSH bucket via random-hyperplane sign bits (seeded)."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 9001):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, "embedding")
        bits = (m @ self.planes) > 0
        key = np.zeros(len(m), dtype=np.uint64)
        for b in range(bits.shape[1]):
            key |= bits[:, b].astype(np.uint64) << np.uint64(b)
        out = {name: batch.column(name) for name in batch.column_names}
        out["bucket"] = pa.array(key, type=pa.uint64())
        return pa.table(out)


def embedding_dup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.99,
    n_bits: int = 12,
    seed: int = 9001,
    dim: int | None = None,
) -> "ray.data.Dataset":
    """Near-duplicate vector pairs (cosine >= threshold) via hyperplane-LSH
    bucketing + in-bucket exact verification. High thresholds keep the
    hyperplane miss probability negligible (theta = arccos(t))."""
    if dim is None:
        first = embeddings.take_batch(1, batch_format="pyarrow")
        dim = len(first.column("embedding")[0])

    bucketed = embeddings.map_batches(
        HyperplaneBucketStage,
        fn_constructor_kwargs={"dim": dim, "n_bits": n_bits, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def verify(group: pa.Table) -> pa.Table:
        m = _batch_matrix(group, "embedding")
        ids = group.column("vec_id").to_numpy()
        if len(ids) < 2:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        cos = quantized_cosine(m, m)
        iu = np.triu_indices(len(ids), k=1)
        c = cos[iu]
        keep = c >= threshold
        a, b = ids[iu[0][keep]], ids[iu[1][keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"src": pa.array(lo), "dst": pa.array(hi),
             "cosine": pa.array(c[keep])}
        )

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")
