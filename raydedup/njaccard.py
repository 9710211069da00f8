"""Exact n-gram Jaccard pair detection via a distributed inverted index.

The deterministic (non-probabilistic) dedup tier: explode every document into
(shingle_hash, id) postings, group by shingle, emit co-occurrence pairs, and
aggregate |A∩B| per pair; J = c / (|A| + |B| - c). Exact — the audit oracle
for the LSH tier, and the engine's "n-gram Jaccard dedup" operator.

Scale note: a shingle shared by m documents emits m(m-1)/2 pair rows —
quadratic on hot shingles (boilerplate). ``max_posting`` caps a posting list:
shingles with more docs than the cap are *dropped* (stop-shingle removal),
which makes results approximate above the cap; the cap is off by default so
oracle-checked runs stay exact. The LSH pipeline (pipeline.py) is the scale
path; this operator is the exactness path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max

from .config import DEFAULT_CONFIG, SigConfig
from .shingle import segment_unique, shingle_hashes
from .tokenize import tokenize_hashes


class ShingleExplode:
    """corpus batch → (sh: uint64, id: int64, nsh: int32) posting rows."""

    def __init__(self, cfg: SigConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        content = batch.column("content")
        flat_tok, tok_off = tokenize_hashes(content, seed=cfg.seed)
        sh, sh_off = shingle_hashes(flat_tok, tok_off, cfg.shingle_k, cfg.seed)
        uniq, uniq_off = segment_unique(sh, sh_off)
        lens = np.diff(uniq_off)
        ids = batch.column("id").to_numpy()
        return pa.table(
            {
                "sh": pa.array(uniq, type=pa.uint64()),
                "id": pa.array(np.repeat(ids, lens), type=pa.int64()),
                "nsh": pa.array(np.repeat(lens.astype(np.int32), lens)),
            }
        )


def _posting_pairs(max_posting: int | None):
    def emit(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_numpy()
        nsh = group.column("nsh").to_numpy()
        order = np.argsort(ids)
        ids, nsh = ids[order], nsh[order]
        n = len(ids)
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "na": pa.array([], pa.int32()),
                "nb": pa.array([], pa.int32()),
            }
        )
        if n < 2 or (max_posting is not None and n > max_posting):
            return empty
        iu = np.triu_indices(n, k=1)
        return pa.table(
            {
                "src": pa.array(ids[iu[0]]),
                "dst": pa.array(ids[iu[1]]),
                "na": pa.array(nsh[iu[0]]),
                "nb": pa.array(nsh[iu[1]]),
            }
        )

    return emit


def ngram_jaccard_pairs(
    corpus: "ray.data.Dataset",
    cfg: SigConfig = DEFAULT_CONFIG,
    threshold: float = 0.7,
    max_posting: int | None = None,
) -> "ray.data.Dataset":
    """→ Dataset(src:int64, dst:int64, jaccard:float64), src < dst, J >= threshold."""
    postings = corpus.select_columns(["id", "content"]).map_batches(
        ShingleExplode(cfg), batch_format="pyarrow"
    )
    pairs = postings.groupby("sh").map_groups(
        _posting_pairs(max_posting), batch_format="pyarrow"
    )
    agg = pairs.groupby(["src", "dst"]).aggregate(Count(), Max("na"), Max("nb"))

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("count()").to_numpy().astype(np.float64)
        na = batch.column("max(na)").to_numpy().astype(np.float64)
        nb = batch.column("max(nb)").to_numpy().astype(np.float64)
        j = c / (na + nb - c)
        keep = j >= threshold
        return pa.table(
            {
                "src": batch.column("src").filter(pa.array(keep)),
                "dst": batch.column("dst").filter(pa.array(keep)),
                "jaccard": pa.array(j[keep], type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
