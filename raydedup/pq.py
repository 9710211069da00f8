"""Product quantization (PQ) for the embedding stack: compress each vector
into m one-byte-ish codes (one per contiguous subspace) and score queries
against the compressed corpus with asymmetric distance (ADC) lookup
tables — the Jegou et al. 2011 recipe that completes the ANN progression
brute-force → IVF (embed.py) → PQ-compressed store.

Ray-Data-first shape:
* ``pq_train`` — per-subspace distributed Lloyd's, reusing
  cluster.kmeans_fit verbatim on a sliced view of the vector column
  (m x n_iter streaming passes; at web scale train on a sample — any
  (m, k, dsub) codebook array is accepted).
* ``pq_encode`` — stateless map_batches: one integer argmin per subspace
  against the broadcast codebooks. dim x 4 bytes/vector shrinks to m
  bytes (uint8 codes while k <= 256).
* ``pq_adc_topk`` — queries build an (nq, m, k) integer LUT of exact
  squared sub-distances ONCE; each encoded batch is scored with pure
  gathers + adds (no per-vector float math), pre-cut to the per-query
  top-k, and merged through the same combiner-tree pattern as embed.py.

Determinism contract (cluster.py's): codebooks live on the 2^20-quantized
integer grid, sub-distances are exact integers < 2^53, ties break to the
lowest code — so encoding is bit-stable across block layouts and the
pq_codes oracle replays training + encoding per subspace in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .cluster import _assign, kmeans_fit, matrix_list_array, quantized_matrix


def _slice_view(ds, col: str, id_col: str, lo: int, hi: int):
    """Dataset view with ``col`` replaced by its [lo, hi) slice."""

    def fn(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    col: pa.array([], pa.list_(pa.float64())),
                }
            )
        m = quantized_matrix(batch, col)[:, lo:hi] / 1048576.0
        return pa.table(
            {id_col: batch.column(id_col), col: matrix_list_array(m)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pq_train(
    ds,
    m: int,
    k_codes: int = 256,
    n_iter: int = 4,
    col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> np.ndarray:
    """(m, k_codes, dsub) quantized codebooks: kmeans_fit per contiguous
    subspace (dim must divide evenly by m). Prototype init per subspace,
    so the SQL oracle can replay every round."""
    if dim is None:
        first = ds.take(1)
        if not first:
            raise ValueError("empty dataset")
        dim = len(first[0][col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = np.zeros((m, k_codes, dsub), dtype=np.float64)
    for j in range(m):
        sub = _slice_view(ds, col, id_col, j * dsub, (j + 1) * dsub)
        cent = kmeans_fit(sub, k=k_codes, n_iter=n_iter, col=col, id_col=id_col)
        books[j, : len(cent)] = cent
        if len(cent) < k_codes:
            # fewer rows than codes: duplicate the last centroid so argmin
            # ties resolve to the lowest (real) code
            books[j, len(cent) :] = cent[-1]
    return books


def pq_encode(ds, codebooks: np.ndarray, col: str = "embedding", id_col: str = "vec_id"):
    """(id_col, codes list<int64> length m) — nearest code per subspace
    (exact integer squared-L2 argmin, ties to the lowest code)."""
    import ray

    books = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    ref = ray.put(books)

    def fn(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        if not batch.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "codes": pa.array([], pa.list_(pa.int64())),
                }
            )
        qm = quantized_matrix(batch, col)
        codes = np.empty((len(qm), m), dtype=np.int64)
        for j in range(m):
            codes[:, j] = _assign(qm[:, j * dsub : (j + 1) * dsub], b[j])
        return pa.table(
            {id_col: batch.column(id_col), "codes": matrix_list_array(codes)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _codes_matrix(batch: pa.Table) -> np.ndarray:
    arr = batch.column("codes")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # a sliced list array keeps the FULL values buffer with absolute
    # offsets — slice to the window and derive m from the offsets rather
    # than len(values)//rows (which silently mis-decodes sliced inputs)
    off = np.asarray(arr.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    base, end = int(off[0]), int(off[-1])
    flat = flat[base:end]
    n = len(arr)
    m = (end - base) // max(n, 1)
    return flat.reshape(n, m)


class PqAdcScorer:
    """Actor-pool stage: per-query (m, k) integer LUTs of exact squared
    sub-distances built once in __init__; each encoded batch is scored by
    LUT gathers + row sums and pre-cut to the per-query top-k (distance
    asc, id asc) — output <= nq*k rows per batch."""

    def __init__(self, queries_ref, query_ids, codebooks_ref, k: int):
        from .cluster import _sq_dists
        from .embed import quantize
        from .io import broadcast_value

        q = broadcast_value(queries_ref)
        books = broadcast_value(codebooks_ref)

        qq = quantize(np.asarray(q, dtype=np.float64))
        m, kc, dsub = books.shape
        # LUT[nq, m, kc]: exact integer ||q_sub - code||^2
        self.lut = np.empty((len(qq), m, kc), dtype=np.float64)
        for j in range(m):
            self.lut[:, j, :] = _sq_dists(qq[:, j * dsub : (j + 1) * dsub], books[j])
        self.query_ids = np.asarray(query_ids)
        self.k = k
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        if not len(ids):
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        codes = _codes_matrix(batch)
        # pre-sort rows by id so the stable argsort below breaks distance
        # ties to the lowest vec_id — PQ codes collide freely (identical
        # codes => identical ADC distance), and the merge tree's total
        # order is (dist asc, id asc); a bare argpartition pre-cut would
        # drop tie members nondeterministically
        row_order = np.argsort(ids, kind="stable")
        ids = ids[row_order]
        codes = codes[row_order]
        n, nq = len(ids), len(self.query_ids)
        # gather-sum: dist[q, row] = sum_j LUT[q, j, codes[row, j]]
        dist = np.zeros((nq, n), dtype=np.float64)
        for j in range(self.m):
            dist += self.lut[:, j, codes[:, j]]
        kk = min(self.k, n)
        part = np.argsort(dist, axis=1, kind="stable")[:, :kk]
        out_q = np.repeat(self.query_ids, kk)
        out_v = ids[part].ravel()
        out_d = np.take_along_axis(dist, part, axis=1).ravel()
        # negated distance in a column named "cosine" so embed._final_topk
        # (a max-score combiner tree) merges it unchanged
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(-out_d, pa.float64()),
            }
        )


def pq_adc_topk(
    encoded,
    codebooks: np.ndarray,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
) -> pa.Table:
    """Approximate top-k over the ENCODED corpus (from pq_encode), merged
    through embed.py's combiner-tree top-k (the scored stream is never
    sorted or shuffled). Returns (query_id, vec_id, adc_dist) with
    adc_dist ascending per query."""
    import ray

    from .embed import _final_topk, _pool

    from .io import put_broadcast

    books = np.asarray(codebooks, dtype=np.float64)
    c_ref = put_broadcast(books)
    q_ref = put_broadcast(np.asarray(queries, dtype=np.float64))
    scored = encoded.map_batches(
        PqAdcScorer,
        fn_constructor_args=(q_ref, np.asarray(query_ids), c_ref, k),
        batch_format="pyarrow",
        # autoscaling (min, max) pool bounds, the embed.py convention — a
        # fixed cap would serialize ADC scoring onto one actor
        concurrency=_pool(),
        batch_size=16384,
    )
    merged = _final_topk(scored, k)
    return pa.table(
        {
            "query_id": merged.column("query_id"),
            "vec_id": merged.column("vec_id"),
            "adc_dist": pa.array(
                -merged.column("cosine").to_numpy(zero_copy_only=False),
                pa.float64(),
            ),
        }
    )
