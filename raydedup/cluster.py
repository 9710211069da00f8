"""Distributed k-means (Lloyd's) and SemDeDup semantic deduplication over a
vector column.

The reference library has no clustering operator — these are the
training-data-pipeline additions on top of the embedding stack
(raydedup/embed.py): ``kmeans_fit`` is the full-dataset analogue of the
sample-based ``kmeans_centroids`` used by the IVF index, and ``semdedup``
implements the SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
cluster the embeddings, then drop near-duplicate pairs *within* each
cluster so the pairwise comparison volume is O(sum of cluster sizes
squared), never corpus-squared.

Determinism contract (shared with ann_topk / embedding_dup_pairs): vectors
are quantized to integers (``floor(x * 2^20)``) so every dot product,
squared distance and norm is an exact integer representable in float64
(|q| <= 2^20, dim <= 256 keeps all sums < 2^53) — results are then
bit-identical regardless of summation order, batch boundaries, or engine
(numpy vs DuckDB), which is what lets a chained-CTE SQL oracle replay the
full Lloyd's iteration loop and the SemDeDup prune exactly.

Scale shape (100 TB):
* ``kmeans_fit`` — one streaming pass per iteration; per-block partials are
  a (k, dim) int64 sum matrix + k counts combined by Ray's aggregate
  combiner tree (the same shape as the sketch aggregates in
  aggregates.py); driver state is one (k, dim) matrix. Centroids are
  broadcast once per iteration via ``ray.put``.
* ``kmeans_assign`` — stateless map_batches against the broadcast matrix.
* ``semdedup`` — one hash shuffle on the cluster id, then per-cluster
  vectorized pairwise cosine inside ``map_groups``. The per-cluster cost is
  the SemDeDup paper's own assumption: pick k so the expected cluster size
  (n / k) fits a worker (the paper uses k ~ 100k at web scale); row-chunked
  matmuls bound the transient n x n block to ``chunk_rows`` x n.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .embed import _batch_matrix, quantize


def matrix_list_array(m: np.ndarray) -> pa.ListArray:
    """(n, d) numpy matrix -> list<item> column via one flat values buffer
    + computed offsets; pa.array(list(matrix)) pays a Python object per
    ROW, which dominates hot encode/project paths."""
    n, d = m.shape
    off = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32())
    return pa.ListArray.from_arrays(off, pa.array(np.ascontiguousarray(m).reshape(-1)))


def quantized_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(rows, dim) float64 matrix of exact integers: floor(x * 2^20)."""
    return quantize(_batch_matrix(batch, col))


def _sq_dists(qm: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact integer-valued squared L2 distances (rows, k).

    All three terms are sums of products of integers <= 2^20, so every
    intermediate is an exact integer < 2^53 in float64 — the result is
    bit-identical to DuckDB's list_inner_product expansion."""
    qq = (qm * qm).sum(axis=1)
    cc = (cent * cent).sum(axis=1)
    return qq[:, None] - 2.0 * (qm @ cent.T) + cc[None, :]


def _assign(qm: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest-centroid ids; ties broken toward the lowest cluster index
    (np.argmin keeps the first minimum)."""
    return np.argmin(_sq_dists(qm, cent), axis=1).astype(np.int64)


def _state_ser(sums: np.ndarray, counts: np.ndarray) -> bytes:
    k, dim = sums.shape
    head = np.array([k, dim], dtype=np.int64)
    return head.tobytes() + sums.tobytes() + counts.tobytes()


def _state_de(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    k, dim = np.frombuffer(b[:16], dtype=np.int64)
    sums = np.frombuffer(b[16 : 16 + 8 * k * dim], dtype=np.int64).reshape(k, dim)
    counts = np.frombuffer(b[16 + 8 * k * dim :], dtype=np.int64)
    return sums.copy(), counts.copy()


def _partial_aggregate(col: str, cent_ref, k: int, dim: int):
    """AggregateFn carrying (k, dim) int64 cluster sums + counts — combined
    by Ray's combiner tree, so the shuffled state is k*(dim+1)*8 bytes per
    partial regardless of input size."""
    import ray
    from ray.data.aggregate import AggregateFn

    def _cent():
        import ray as _ray

        return (
            _ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        )

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sums, counts = (
            _state_de(state)
            if state
            else (np.zeros((k, dim), np.int64), np.zeros(k, np.int64))
        )
        if block.num_rows:
            qm = quantized_matrix(block, col)
            a = _assign(qm, _cent())
            np.add.at(sums, a, qm.astype(np.int64))
            counts += np.bincount(a, minlength=k).astype(np.int64)
        return _state_ser(sums, counts)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or _state_ser(np.zeros((k, dim), np.int64), np.zeros(k, np.int64))
        if not b:
            return a
        sa, ca = _state_de(a)
        sb, cb = _state_de(b)
        return _state_ser(sa + sb, ca + cb)

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s,
        name="kmeans_partial",
    )


def smallest_k_rows(ds, k: int, id_col: str, col: str) -> np.ndarray:
    """Quantized vectors of the k smallest ids, without a sort shuffle:
    each block pre-cuts to its own k smallest rows (map-side, lossless for
    a global top-k), the driver merges O(blocks * k) tiny rows."""

    def precut(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch.select([id_col, col])
        idx = np.argsort(batch.column(id_col).to_numpy(), kind="stable")[:k]
        return batch.select([id_col, col]).take(pa.array(idx))

    small = ds.map_batches(precut, batch_format="pyarrow").take_all()
    ids = np.array([r[id_col] for r in small])
    order = np.argsort(ids, kind="stable")[:k]
    vecs = np.array([small[i][col] for i in order], dtype=np.float64)
    return quantize(vecs)


def kmeans_fit(
    ds,
    k: int,
    n_iter: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
    init: np.ndarray | str = "prototype",
) -> np.ndarray:
    """Full-dataset Lloyd's k-means; returns integer-valued quantized
    centroids (k, dim) float64.

    ``init="prototype"`` seeds from the k smallest-id vectors (a
    deterministic choice the SQL oracle can replay; its map-side top-k
    pre-cut holds O(blocks x k) driver rows, so it is meant for small and
    mid k). For web-scale k (SemDeDup's ~100k regime) pass an explicit
    init matrix — e.g. ``quantize(embed.kmeans_centroids(sample, k))``
    over a driver-side sample — and note the aggregate's combiner state is
    k x dim x 8 bytes per partial (100k x 1024 dims ~ 0.8 GB: at that
    shape train on a sample and use ``kmeans_assign``, which is stateless,
    for the full corpus). Each iteration is one streaming aggregate pass;
    empty clusters keep their previous centroid (same rule as
    embed.kmeans_centroids). Centroid update is floor(sum / count) — exact
    while per-cluster sums stay below 2^53 (2^20-scaled coords x up to
    ~8e9 rows per cluster)."""
    import ray

    if isinstance(init, str):
        if init != "prototype":
            raise ValueError(f"unknown init: {init!r}")
        cent = smallest_k_rows(ds, k, id_col, col)
        if cent.size == 0:
            raise ValueError("empty dataset")
        # fewer rows than k: train the n centroids we have (the
        # embed.kmeans_centroids rule; the SQL oracle's LIMIT k agrees)
    else:
        cent = np.asarray(init, dtype=np.float64)
    k, dim = cent.shape
    for _ in range(n_iter):
        ref = ray.put(cent)
        state = ds.aggregate(_partial_aggregate(col, ref, k, dim))["kmeans_partial"]
        sums, counts = _state_de(state)
        new = cent.copy()
        nz = counts > 0
        new[nz] = np.floor(sums[nz].astype(np.float64) / counts[nz, None])
        cent = new
    return cent


def kmeans_assign(
    ds, centroids: np.ndarray, col: str = "embedding", id_col: str = "vec_id"
):
    """(id_col, cluster) dataset: nearest quantized centroid per row.
    Centroids are broadcast once via ``ray.put``."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        if not batch.num_rows:
            id_type = batch.schema.field(id_col).type
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        a = _assign(quantized_matrix(batch, col), cent)
        return pa.table(
            {id_col: batch.column(id_col), "cluster": pa.array(a, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _semdedup_cluster_kept(
    qm: np.ndarray,
    ids: np.ndarray,
    c: np.ndarray,
    threshold: float,
    keep: str,
    chunk_rows: int,
) -> np.ndarray:
    """Kept mask for one cluster's member matrix (rows aligned to ids)."""
    n = len(ids)
    if n <= 1:
        return np.ones(n, dtype=bool)
    # centroid cosine: every term exact-integer in float64 → bit-stable
    norms = np.sqrt((qm * qm).sum(axis=1))
    norms[norms == 0] = 1.0
    cn = np.sqrt((c * c).sum())
    cn = cn if cn > 0 else 1.0
    s = (qm @ c) / (norms * cn)
    # keep-priority: LOW centroid similarity first (the SemDeDup rule —
    # the cluster's most atypical member survives its duplicate group),
    # id as the tie-break (rank-encoded so string ids sort too)
    _, id_rank = np.unique(ids, return_inverse=True)
    order = np.lexsort((id_rank, s))
    qs = qm[order]
    ns = norms[order]
    dropped = np.zeros(n, dtype=bool)
    for i0 in range(1, n, chunk_rows):
        i1 = min(i0 + chunk_rows, n)
        # cosine of rows [i0:i1] vs ALL lower-priority rows [0:i1)
        cos = (qs[i0:i1] @ qs[:i1].T) / (ns[i0:i1, None] * ns[None, :i1])
        tri = np.tril(cos >= threshold, k=i0 - 1)  # strictly-earlier cols only
        if keep == "greedy":
            # scan rows in priority order; only NOT-dropped earlier rows kill
            for r in range(i1 - i0):
                row = tri[r, : i0 + r]
                if (row & ~dropped[: i0 + r]).any():
                    dropped[i0 + r] = True
        else:  # dominance: any earlier row kills, dropped or not
            dropped[i0:i1] = tri.any(axis=1)
    kept = np.ones(n, dtype=bool)
    kept[order] = ~dropped
    return kept


def semdedup(
    ds,
    centroids: np.ndarray,
    threshold: float,
    col: str = "embedding",
    id_col: str = "vec_id",
    keep: str = "dominance",
    chunk_rows: int = 4096,
    nparts: int = 64,
):
    """SemDeDup over a vector column: assign each row to its nearest
    centroid, then mark within-cluster near-duplicates (quantized cosine >=
    ``threshold``) as ``kept=false``. Returns (id_col, cluster, kept).

    ``keep="dominance"`` (default): row x is dropped iff SOME row y in the
    same cluster with lower keep-priority key (centroid-cosine asc, id asc)
    has cos(x, y) >= threshold — a pure pairwise rule the SQL oracle
    replays with one self-join. ``keep="greedy"`` only lets surviving rows
    kill (keeps strictly more rows; transitive-chain-safe, matching the
    text tiers' star rule) at the cost of a sequential scan per cluster.

    One shuffle total, on ``cluster % nparts`` — the repo's
    hash-partition-then-block rule (pipeline.py:294): map_groups pays a
    Python call per GROUP, so grouping on the partition key and walking
    cluster runs inside the block keeps that overhead at nparts, not k.
    Pairwise work is per-cluster only; transient memory is bounded by
    chunk_rows x cluster rows. Pick k (via kmeans_fit) so clusters fit a
    worker — the SemDeDup paper's own operating assumption."""
    import ray

    cent = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(cent)

    def fn(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        if not batch.num_rows:
            id_type = batch.schema.field(id_col).type
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "cluster": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        a = _assign(quantized_matrix(batch, col), c)
        return (
            batch.select([id_col, col])
            .append_column("cluster", pa.array(a, pa.int64()))
            .append_column("part", pa.array(a % nparts, pa.int64()))
        )

    assigned = ds.map_batches(fn, batch_format="pyarrow")

    def part_fn(block: pa.Table) -> pa.Table:
        c = ray.get(ref)
        clusters = block.column("cluster").to_numpy()
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        qm = quantized_matrix(block, col)
        order = np.argsort(clusters, kind="stable")
        cs, qs, idss = clusters[order], qm[order], ids[order]
        bounds = np.flatnonzero(np.diff(cs)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cs)]])
        kept = np.empty(len(cs), dtype=bool)
        for s0, s1 in zip(starts, ends):
            kept[s0:s1] = _semdedup_cluster_kept(
                qs[s0:s1], idss[s0:s1], c[cs[s0]], threshold, keep, chunk_rows
            )
        return pa.table(
            {
                # preserve the input id type (string ids work end-to-end)
                id_col: pa.array(idss, block.schema.field(id_col).type),
                "cluster": pa.array(cs, pa.int64()),
                "kept": pa.array(kept),
            }
        )

    return assigned.groupby("part").map_groups(part_fn, batch_format="pyarrow")
