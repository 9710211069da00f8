"""Deterministic term-based text retrieval — top-k documents for a bag of
query terms, ranked by (distinct terms matched, total term frequency,
doc id). The text analog of embed.ann_topk: broadcast the tiny query side,
score map-side, pre-cut per batch, merge a bounded candidate set.

The ranking is INTEGER-exact by design (no tf-idf/BM25 float chain), so
the DuckDB oracle value-hash-matches the full ranked result — the same
trade the repo's tfidf/lm operators make: keep the statistic exact-
mirrorable, leave float model scores to the recall-tested paths.

Scale shape: term hashes broadcast once; one stateless ``map_batches``
computes per-doc (n_matched, total_tf) and pre-cuts its batch to the top
``k`` under the FULL ordering (the global top-k is a subset of the union
of per-batch top-ks, so the pre-cut is lossless); the surviving
``k × n_blocks`` candidate rows — independent of corpus size — are sorted
once and cut to k. No shuffle of the corpus, no driver-side scoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import xxh64_flat
from .tokenize import _string_array_np, tokenize_hashes


def _term_hashes(terms: tuple[str, ...], seed: int) -> np.ndarray:
    enc = [t.encode() for t in terms]
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    off = np.concatenate([[0], np.cumsum([len(e) for e in enc])]).astype(np.int64)
    return xxh64_flat(flat, off, seed=seed)


class SearchScorer:
    """corpus batch → per-doc (id, n_matched, total_tf) for docs matching
    >= 1 term, pre-cut to the batch's top-k under the full ordering."""

    def __init__(self, terms: tuple[str, ...], k: int, seed: int,
                 id_col: str = "doc_id", text_col: str = "text"):
        if not terms:
            raise ValueError("terms must be non-empty")
        if k <= 0:
            raise ValueError("k must be positive")
        self.th = np.unique(_term_hashes(tuple(terms), seed))
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, off = tokenize_hashes(batch.column(self.text_col), seed=0)
        n = batch.num_rows
        per_row = np.diff(off)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), per_row)
        pos = np.searchsorted(self.th, flat)
        pos = np.minimum(pos, len(self.th) - 1)
        hit = self.th[pos] == flat
        total_tf = np.bincount(doc_of[hit], minlength=n).astype(np.int64)
        # distinct matched terms per doc: unique (doc, term-slot) pairs
        n_matched = np.zeros(n, dtype=np.int64)
        if hit.any():
            keys = doc_of[hit] * len(self.th) + pos[hit]
            uk = np.unique(keys)
            n_matched = np.bincount(
                (uk // len(self.th)).astype(np.int64), minlength=n
            ).astype(np.int64)
        ids = batch.column(self.id_col).to_numpy()
        m = total_tf > 0
        ids, n_matched, total_tf = ids[m], n_matched[m], total_tf[m]
        # lossless per-batch pre-cut under the FULL ordering
        order = np.lexsort((ids, -total_tf, -n_matched))[: self.k]
        return pa.table(
            {
                self.id_col: pa.array(ids[order], pa.int64()),
                "n_matched": pa.array(n_matched[order], pa.int64()),
                "total_tf": pa.array(total_tf[order], pa.int64()),
            }
        )


def text_search_topk(
    docs: "ray.data.Dataset",  # noqa: F821 - ray imported lazily
    terms: tuple[str, ...],
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ Dataset(id_col, n_matched, total_tf, rank) — the k best-matching
    documents, rank 1-based under (n_matched DESC, total_tf DESC, id ASC);
    fewer rows when fewer documents match any term."""
    cands = docs.select_columns([id_col, text_col]).map_batches(
        SearchScorer(terms, k, seed=0, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )

    def final_cut(block: pa.Table) -> pa.Table:
        ids = block.column(id_col).to_numpy()
        nm = block.column("n_matched").to_numpy()
        tf = block.column("total_tf").to_numpy()
        order = np.lexsort((ids, -tf, -nm))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "n_matched": pa.array(nm[order], pa.int64()),
                "total_tf": pa.array(tf[order], pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    # candidate set is <= k x n_blocks rows — independent of corpus size —
    # so one single-partition cut is the cheapest exact merge
    return cands.repartition(1).map_batches(
        final_cut, batch_format="pyarrow", batch_size=None
    )
