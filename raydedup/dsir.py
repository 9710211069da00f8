"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every raw document by how much more likely its n-gram bag is under a
TARGET corpus' distribution than under the raw corpus' own — then keep
the highest-weight documents.

This engine's formulation (integer-exact, the :mod:`raydedup.lm`
convention): both distributions are pruned bigram count tables
(:func:`raydedup.lm.bigram_model` — hashed-stream ingest, reference
theta/UpdateSketch.java:220-324 style). For a document with bigram
occurrences g_1..g_n,

* ``hit_sum_t`` = Σ count_T(g_i)  (integer; 0 for unmodeled bigrams),
* ``hit_sum_r`` = Σ count_R(g_i),
* ``weight``    = (1 + hit_sum_t · N_R) / (1 + hit_sum_r · N_T)

where N_T / N_R are the pruned models' total masses (Σ counts) — the
cross-multiplication normalizes the two corpora's sizes exactly the way
the paper's p_target(x)/p_raw(x) ratio does, without per-feature log
chains (whose summation order would break bit-exact oracle comparison).
The two products and the division are ONE fixed IEEE-double op sequence
(int64 → double conversions are exact below 2^53; the double multiply
and divide are correctly rounded and identical in DuckDB), so the value
hash matches bit for bit.

Scale shape: two :func:`bigram_model` count passes (shuffle volume =
distinct bigrams × 16 B each — never the text), both pruned models
``ray.put`` ONCE, then one shuffle-free map-side score pass over the raw
corpus with four searchsorted gathers per batch. Selection on the weight
(top-k / threshold) composes with the existing curation operators
(raydedup.scan global ranks, raydedup.curate caps).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .config import DEFAULT_CONFIG, SigConfig
from .lm import DEFAULT_MIN_COUNT, _bigram_hashes, bigram_model

_MAX_EXACT = float(2**53)


def dsir_weights(
    corpus: "ray.data.Dataset",  # noqa: F821 - ray imported lazily
    target: "ray.data.Dataset",  # noqa: F821
    cfg: SigConfig = DEFAULT_CONFIG,
    min_count: int = DEFAULT_MIN_COUNT,
    id_col: str = "id",
    content_col: str = "content",
    keep_cols: tuple = (),
) -> "ray.data.Dataset":
    """→ Dataset(id, n_bigrams, hit_sum_t, hit_sum_r, weight[, *keep_cols])
    over every ``corpus`` row. ``target`` is the curated high-quality
    corpus whose distribution we want the selection to match."""
    import ray

    mh_t, mc_t = bigram_model(target, cfg, min_count=min_count, content_col=content_col)
    mh_r, mc_r = bigram_model(corpus, cfg, min_count=min_count, content_col=content_col)
    n_t = int(mc_t.sum())
    n_r = int(mc_r.sum())
    ref = ray.put((mh_t, mc_t, mh_r, mc_r))

    def _gather(mh: np.ndarray, mc: np.ndarray, w: np.ndarray) -> np.ndarray:
        if len(mh) == 0 or len(w) == 0:
            return np.zeros(len(w), dtype=np.int64)
        pos = np.minimum(np.searchsorted(mh, w), len(mh) - 1)
        return np.where(mh[pos] == w, mc[pos], 0).astype(np.int64)

    def score(batch: pa.Table) -> pa.Table:
        mh_t_, mc_t_, mh_r_, mc_r_ = ray.get(ref)
        w, counts = _bigram_hashes(batch.column(content_col), cfg.seed)
        n = batch.num_rows
        contrib_t = _gather(mh_t_, mc_t_, w)
        contrib_r = _gather(mh_r_, mc_r_, w)
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        hit_t = np.zeros(n, dtype=np.int64)
        hit_r = np.zeros(n, dtype=np.int64)
        if len(row_of):
            starts = np.flatnonzero(
                np.concatenate([[True], row_of[1:] != row_of[:-1]])
            )
            seg_rows = row_of[starts]
            hit_t[seg_rows] = np.add.reduceat(contrib_t, starts)
            hit_r[seg_rows] = np.add.reduceat(contrib_r, starts)
        num = hit_t.astype(np.float64) * float(n_r)
        den = hit_r.astype(np.float64) * float(n_t)
        if (num > _MAX_EXACT).any() or (den > _MAX_EXACT).any():
            # beyond 2^53 the int64→double conversion stops being exact;
            # the weight is still well-defined but no longer bit-matchable
            # against an integer-replaying oracle — surface it loudly
            raise OverflowError(
                "dsir_weights: hit_sum x model mass exceeds 2^53; "
                "use a larger min_count to shrink the models"
            )
        weight = (1.0 + num) / (1.0 + den)
        cols = {
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(counts.astype(np.int64), pa.int64()),
            "hit_sum_t": pa.array(hit_t, pa.int64()),
            "hit_sum_r": pa.array(hit_r, pa.int64()),
            "weight": pa.array(weight, pa.float64()),
        }
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    sel = [id_col, content_col] + [
        c for c in keep_cols if c not in (id_col, content_col)
    ]
    return corpus.select_columns(sel).map_batches(score, batch_format="pyarrow")


def dsir_select(
    corpus: "ray.data.Dataset",  # noqa: F821
    target: "ray.data.Dataset",  # noqa: F821
    threshold: float,
    cfg: SigConfig = DEFAULT_CONFIG,
    min_count: int = DEFAULT_MIN_COUNT,
    id_col: str = "id",
    content_col: str = "content",
    keep_cols: tuple = (),
) -> "ray.data.Dataset":
    """Survivors-only: corpus rows whose importance weight clears
    ``threshold``. Map-side filter on the score pass — no extra shuffle.
    (For an exact global top-k instead of a threshold, rank the
    :func:`dsir_weights` output with raydedup.scan's ordered-scan ranks.)"""
    scored = dsir_weights(
        corpus,
        target,
        cfg,
        min_count=min_count,
        id_col=id_col,
        content_col=content_col,
        keep_cols=keep_cols,
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("weight"), threshold))

    return scored.map_batches(keep, batch_format="pyarrow")
