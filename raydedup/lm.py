"""Corpus-trained n-gram language-model quality scoring — the distributed
shape of CCNet's KenLM perplexity filter (Wenzek et al. 2019 §3.3: score
every document against an n-gram LM and filter on the score).

This engine's model is a token-BIGRAM count table trained on the corpus
itself and pruned to bigrams seen >= ``min_count`` times; a document's
score is the mean model count of its bigram occurrences — an integer-exact
perplexity proxy (no log/backoff float chains, so the DuckDB oracle can
value-hash-match it bit for bit; the float column is ONE IEEE division
shared with the SQL mirror, the tfidf_top_terms precedent).

Semantics (mirrored exactly by the oracle in __ray_entry__):

* tokens: ASCII-trim + ``\\s+`` split (the repo-wide rule);
* bigrams: every adjacent token pair, every OCCURRENCE (repeats count);
  docs with < 2 tokens have no bigrams and score 0;
* model: global occurrence count per distinct bigram, kept iff
  count >= ``min_count`` (pruning — the broadcastable-model invariant);
* per doc: ``n_bigrams`` (occurrences), ``n_hits`` (occurrences whose
  bigram is in the pruned model), ``hit_sum`` (sum of model counts over
  those occurrences), ``score`` = hit_sum / max(n_bigrams, 1) as DOUBLE.

Identity convention: bigram = xxh64 over its 2 token hashes (shingle.py),
as everywhere (reference theta/UpdateSketch.java:220-324 hashed-stream
ingest); collisions 2^-64-scale, shared with the oracle's exact-string
assumption.

Scale shape (CCNet's "ship the model to the data"):

1. **count pass** — map_batches dedups bigram occurrences per batch into
   (h: u64, c: i64) partials (shuffle volume = distinct bigrams per batch
   x 16 B, never the text); one hash-partitioned vectorized sum
   (pipeline.grouped_blocks) prunes to count >= min_count. The pruned
   model is <= total_bigrams/min_count entries — small by construction —
   so it is collected once and ``ray.put`` once.
2. **score pass** — map_batches re-derives each doc's bigram hashes and
   scores against the broadcast sorted (hash, count) arrays with two
   searchsorted gathers. No shuffle of the doc side at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .config import DEFAULT_CONFIG, SigConfig
from .shingle import shingle_hashes
from .tokenize import tokenize_hashes

DEFAULT_MIN_COUNT = 3


def _bigram_hashes(content, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat bigram hashes, per-row bigram counts); rows with < 2 tokens
    contribute none (shingle_hashes' single short-row shingle is dropped,
    same rule as spans.WindowExplode)."""
    flat_tok, tok_off = tokenize_hashes(content, seed=seed)
    w, w_off = shingle_hashes(flat_tok, tok_off, 2, seed)
    lens = np.diff(tok_off)
    wlens = np.diff(w_off)
    keep_row = lens >= 2
    keep = np.repeat(keep_row, wlens)
    counts = np.where(keep_row, wlens, 0).astype(np.int64)
    return w[keep], counts


def bigram_model(
    corpus: "ray.data.Dataset",  # noqa: F821 - ray imported lazily
    cfg: SigConfig = DEFAULT_CONFIG,
    min_count: int = DEFAULT_MIN_COUNT,
    content_col: str = "content",
) -> tuple[np.ndarray, np.ndarray]:
    """Train the pruned bigram count table → (sorted hashes: u64,
    counts: i64). Streaming partial-count pass; only the pruned model is
    materialized driver-side (<= total_bigrams/min_count entries)."""
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 keeps every bigram)")
    from .pipeline import grouped_blocks

    def partials(batch: pa.Table) -> pa.Table:
        w, _ = _bigram_hashes(batch.column(content_col), cfg.seed)
        if len(w) == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        hu, c = np.unique(w, return_counts=True)
        return pa.table(
            {
                "h": pa.array(hu.view(np.int64), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def sum_prune(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        h = block.column("h").to_numpy()
        c = block.column("c").to_numpy()
        order = np.argsort(h, kind="stable")
        h_s, c_s = h[order], c[order]
        starts = np.ones(len(h_s), dtype=bool)
        starts[1:] = h_s[1:] != h_s[:-1]
        idx = np.flatnonzero(starts)
        sums = np.add.reduceat(c_s, idx)
        keep = sums >= min_count
        return pa.table(
            {
                "h": pa.array(h_s[idx][keep], pa.int64()),
                "c": pa.array(sums[keep], pa.int64()),
            }
        )

    model = grouped_blocks(
        corpus.map_batches(partials, batch_format="pyarrow"), "h", sum_prune
    )
    tables = [
        b for b in model.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not tables:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    t = pa.concat_tables(tables)
    h = t.column("h").to_numpy().view(np.uint64)
    c = t.column("c").to_numpy().astype(np.int64)
    order = np.argsort(h)
    return np.ascontiguousarray(h[order]), np.ascontiguousarray(c[order])


def lm_scores(
    corpus: "ray.data.Dataset",  # noqa: F821
    cfg: SigConfig = DEFAULT_CONFIG,
    min_count: int = DEFAULT_MIN_COUNT,
    id_col: str = "id",
    content_col: str = "content",
    model: tuple[np.ndarray, np.ndarray] | None = None,
    keep_cols: tuple = (),
) -> "ray.data.Dataset":
    """→ Dataset(id, n_bigrams, n_hits, hit_sum, score[, *keep_cols]) over
    every input row. ``model`` lets a caller reuse a :func:`bigram_model`
    trained on a different (e.g. clean reference) corpus — CCNet trains on
    curated text and scores the crawl; by default the model is trained on
    ``corpus`` itself (self-scoring, which ranks documents by how typical
    their word sequences are for this corpus). ``keep_cols`` pass extra
    input columns through the (map-side, shuffle-free) score stage — the
    zero-cost way to filter rows on their score downstream."""
    import ray

    if model is None:
        model = bigram_model(
            corpus, cfg, min_count=min_count, content_col=content_col
        )
    mh, mc = model
    ref = ray.put((np.ascontiguousarray(mh), np.ascontiguousarray(mc)))

    def score(batch: pa.Table) -> pa.Table:
        mh_, mc_ = ray.get(ref)
        w, counts = _bigram_hashes(batch.column(content_col), cfg.seed)
        if len(mh_) and len(w):
            pos = np.minimum(np.searchsorted(mh_, w), len(mh_) - 1)
            hit = mh_[pos] == w
            contrib = np.where(hit, mc_[pos], 0)
        else:
            hit = np.zeros(len(w), dtype=bool)
            contrib = np.zeros(len(w), dtype=np.int64)
        n = batch.num_rows
        # INTEGER-exact per-doc sums (the module's contract): row_of is
        # sorted by construction (repeat of arange), so segment-reduce in
        # int64 — float-weighted bincount would round past 2^53 at scale
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        n_hits = np.zeros(n, dtype=np.int64)
        hit_sum = np.zeros(n, dtype=np.int64)
        if len(row_of):
            starts = np.flatnonzero(
                np.concatenate([[True], row_of[1:] != row_of[:-1]])
            )
            seg_rows = row_of[starts]
            n_hits[seg_rows] = np.add.reduceat(hit.astype(np.int64), starts)
            hit_sum[seg_rows] = np.add.reduceat(
                contrib.astype(np.int64), starts
            )
        n_bigrams = counts
        cols = {
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(n_bigrams, pa.int64()),
            "n_hits": pa.array(n_hits, pa.int64()),
            "hit_sum": pa.array(hit_sum, pa.int64()),
            "score": pa.array(
                hit_sum.astype(np.float64)
                / np.maximum(n_bigrams, 1).astype(np.float64),
                pa.float64(),
            ),
        }
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    sel = [id_col, content_col] + [
        c for c in keep_cols if c not in (id_col, content_col)
    ]
    return corpus.select_columns(sel).map_batches(score, batch_format="pyarrow")
