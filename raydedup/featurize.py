"""Feature hashing: text → fixed-dim hashed token-count vectors
("hashing trick", Weinberger et al. 2009 — the fastText/Vowpal-Wabbit
input layer), giving every text corpus an embedding column WITHOUT a model
— which plugs the whole vector stack (cluster.semdedup, classifier,
pca, embed ANN/LSH) into plain documents end-to-end.

Deterministic: tokens hash with the seeded vectorized xxh64 the signature
stage already uses (tokenize.py); bucket = hash % dim, sign = hash's top
bit (the signed hashing trick — collisions cancel in expectation instead
of accumulating); counts are exact integers and the optional L2
normalization divides by the sqrt of an exact integer, so outputs are
bit-stable across block layouts. No SQL oracle is possible (DuckDB has no
xxh64) — the driver query is rows-only and the kernel carries scalar
reference-implementation pytests, the same convention as
doc_fingerprints/minhash_signatures.

Scale shape: stateless map_batches, one bincount per batch, output
dim × 8 bytes/row; downstream consumers quantize to the shared 2^20
integer contract (vectors are L2-normalized → |x| <= 1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .cluster import matrix_list_array
from .tokenize import tokenize_hashes


def hashed_count_matrix(
    content: pa.Array | pa.ChunkedArray, dim: int, seed: int
) -> np.ndarray:
    """(rows, dim) float64 signed hashed token counts (un-normalized)."""
    flat, offsets = tokenize_hashes(content, seed)
    n = len(offsets) - 1
    if len(flat) == 0:
        return np.zeros((n, dim), dtype=np.float64)
    row_ids = np.repeat(
        np.arange(n, dtype=np.int64), np.diff(offsets).astype(np.int64)
    )
    bucket = (flat % np.uint64(dim)).astype(np.int64)
    sign = np.where((flat >> np.uint64(63)).astype(bool), -1.0, 1.0)
    m = np.bincount(row_ids * dim + bucket, weights=sign, minlength=n * dim)
    return m.reshape(n, dim)


def l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1))
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def hashing_vectors(
    ds,
    dim: int = 256,
    col: str = "content",
    id_col: str = "id",
    seed: int = 9001,
    norm: str = "l2",
    out_col: str = "embedding",
):
    """(id_col, out_col list<double>) — stateless hashed-count featurizer.
    ``norm="l2"`` (default) makes rows unit-length (cosine-ready and inside
    the |x| <= 1 envelope the quantized vector stack assumes); ``norm=None``
    keeps raw signed counts."""
    if norm not in ("l2", None):
        raise ValueError(f"unknown norm: {norm!r}")

    def fn(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    out_col: pa.array([], pa.list_(pa.float64())),
                }
            )
        m = hashed_count_matrix(batch.column(col), dim, seed)
        if norm == "l2":
            m = l2_normalize(m)
        return pa.table(
            {id_col: batch.column(id_col), out_col: matrix_list_array(m)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def text_semdedup(
    ds,
    dim: int = 128,
    k: int = 4,
    n_iter: int = 2,
    threshold: float = 0.95,
    col: str = "content",
    id_col: str = "id",
    keep: str = "dominance",
):
    """End-to-end semantic dedup over a TEXT corpus: hashed-count vectors →
    distributed k-means → SemDeDup within-cluster prune. Returns
    (id_col, cluster, kept). NON-EMPTY exact duplicate texts always hash
    to identical vectors (cosine 1.0), so each such group loses all but
    one member at any threshold; near-dups fall off by token-multiset
    overlap. Empty/whitespace-only documents hash to the zero vector,
    whose guarded cosine is 0 — they are all KEPT, never deduped; run an
    emptiness filter (textstats quality rules) before this stage if empty
    duplicates matter.

    The vector table is materialized once (dim x 8 B/row in plasma, ~1 KB
    at dim=128) because k-means makes n_iter+2 passes over it; at corpus
    sizes beyond plasma, write it to parquet with hashing_vectors(...)
    .write_parquet(...) and run kmeans_fit/semdedup over the re-read — the
    featurization is deterministic, so the two layouts agree exactly."""
    from .cluster import kmeans_fit, semdedup

    vecs = hashing_vectors(ds, dim=dim, col=col, id_col=id_col).materialize()
    cent = kmeans_fit(vecs, k=k, n_iter=n_iter, id_col=id_col)
    return semdedup(
        vecs, cent, threshold=threshold, id_col=id_col, keep=keep
    )
