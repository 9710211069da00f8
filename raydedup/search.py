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
from .io import read_parquet as _read_parquet


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
        self.seed = seed
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # the SAME seed must hash terms and tokens or nothing ever matches
        flat, off = tokenize_hashes(batch.column(self.text_col), seed=self.seed)
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


def write_text_index(
    docs: "ray.data.Dataset",  # noqa: F821
    path: str,
    nparts: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    overwrite: bool = False,
) -> dict:
    """Persist an inverted token index under ``path``: postings
    ``(t: token xxh64, id, tf)`` hash-partitioned BY TOKEN into
    ``parts/part-<p>.parquet`` (p = splitmix64(t) % nparts — the same
    routing the query side recomputes, so a term's postings live in
    exactly one known file). ``meta.json`` is the completion marker
    (write_ivf_index's consistency protocol); parts write idempotently
    via tmp + atomic rename, so a crashed build resumes.

    The one-time build cost (one tokenize pass + one partition shuffle of
    16-24 B postings) amortizes over every query: a k-term search then
    reads AT MOST k part files regardless of corpus size."""
    import json
    import os
    import shutil

    from .hashing import splitmix64
    from .incremental import _write_parts

    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        if not overwrite:
            raise FileExistsError(
                f"text index already complete at {path}; pass overwrite=True"
            )
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    def postings(batch: pa.Table) -> pa.Table:
        flat, off = tokenize_hashes(batch.column(text_col), seed=0)
        n = batch.num_rows
        doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        ids = batch.column(id_col).to_numpy()
        if len(flat) == 0:
            return pa.table(
                {
                    "t": pa.array([], pa.uint64()),
                    "id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((flat, doc_of))
        d_s, t_s = doc_of[order], flat[order]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.concatenate([starts, [len(d_s)]]))
        t_u, d_u = t_s[starts], d_s[starts]
        part = (splitmix64(t_u) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "t": pa.array(t_u, pa.uint64()),
                "id": pa.array(ids[d_u], pa.int64()),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    rows = docs.select_columns([id_col, text_col]).map_batches(
        postings, batch_format="pyarrow"
    )
    n = _write_parts(rows, os.path.join(path, "parts"), nparts)
    tmp = meta_path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"nparts": nparts, "postings": n, "id_col": id_col}, f)
    os.replace(tmp, meta_path)
    return {"nparts": nparts, "postings": n}


def index_parts_for_terms(path: str, terms: tuple[str, ...]) -> list[str]:
    """The exact part files a term set routes to (the partition-pruning
    contract — tested, not just claimed)."""
    import json
    import os

    from .hashing import splitmix64

    with open(os.path.join(path, "meta.json")) as f:
        nparts = json.load(f)["nparts"]
    th = _term_hashes(tuple(terms), seed=0)
    parts = sorted(set((splitmix64(th) % np.uint64(nparts)).astype(int).tolist()))
    out = []
    for p in parts:
        fp = os.path.join(path, "parts", f"part-{p:05d}.parquet")
        if os.path.exists(fp):  # a part with no postings was never written
            out.append(fp)
    return out


def text_search_indexed(
    path: str,
    terms: tuple[str, ...],
    k: int = 50,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Search the persisted index: read ONLY the <= len(terms) part files
    the query routes to, filter their postings to the term hashes, and
    aggregate per doc — identical output contract to
    :func:`text_search_topk` (asserted by pytest), at a read cost
    independent of corpus size."""
    import ray.data

    from .pipeline import grouped_blocks

    th = np.unique(_term_hashes(tuple(terms), seed=0))
    files = index_parts_for_terms(path, terms)
    if not files:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_matched": pa.array([], pa.int64()),
                    "total_tf": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    posts = _read_parquet(files)

    def hit_filter(b: pa.Table) -> pa.Table:
        t = b.column("t").to_numpy()
        pos = np.minimum(np.searchsorted(th, t), len(th) - 1)
        return b.filter(pa.array(th[pos] == t))

    hits = posts.map_batches(hit_filter, batch_format="pyarrow")

    def per_doc(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_matched": pa.array([], pa.int64()),
                    "total_tf": pa.array([], pa.int64()),
                }
            )
        ids = block.column("id").to_numpy()
        tf = block.column("tf").to_numpy()
        order = np.argsort(ids, kind="stable")
        i_s, f_s = ids[order], tf[order]
        first = np.ones(len(i_s), dtype=bool)
        first[1:] = i_s[1:] != i_s[:-1]
        starts = np.flatnonzero(first)
        nm = np.diff(np.concatenate([starts, [len(i_s)]]))
        tfs = np.add.reduceat(f_s, starts)
        out_ids, out_nm, out_tf = i_s[starts], nm, tfs
        cut = np.lexsort((out_ids, -out_tf, -out_nm))[:k]
        return pa.table(
            {
                id_col: pa.array(out_ids[cut], pa.int64()),
                "n_matched": pa.array(out_nm[cut].astype(np.int64), pa.int64()),
                "total_tf": pa.array(out_tf[cut].astype(np.int64), pa.int64()),
            }
        )

    cands = grouped_blocks(hits, "id", per_doc)

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

    return cands.repartition(1).map_batches(
        final_cut, batch_format="pyarrow", batch_size=None
    )
