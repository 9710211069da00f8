"""Recall auditing with confidence bounds (sampling-sketch tier).

At production scale the true dup-pair set is unknowable without an
exhaustive O(n²)-ish pass, so recall is *estimated*: sample documents with
probability p (deterministic per-id hash → reproducible and mergeable,
exactly like the sampling sketches' item hashing), run the EXACT inverted-
index n-gram Jaccard dedup on the sample (both endpoints sampled ⇒ a true
pair survives w.p. p²), and compare against the pipeline's verified edges
restricted to the same sample. The recall estimate carries binomial
proportion bounds (common/BoundsOnBinomialProportions.java formulas via
bounds.py) — the SampleSubsetSummary-style result the reference's sampling
package produces (sampling/VarOptItemsSketch.java:636-675).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

from .bounds import approx_lower_bound_on_p, approx_upper_bound_on_p
from .config import SigConfig
from .hashing import splitmix64
from .njaccard import ngram_jaccard_pairs


@dataclass
class RecallAudit:
    recall_estimate: float
    recall_lb: float
    recall_ub: float
    truth_pairs_in_sample: int
    found_pairs_in_sample: int
    sample_rate: float
    threshold: float


def _sampled(ids: np.ndarray, rate: float, seed: int) -> np.ndarray:
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed * 0x9E37 + 0xA0D17))
    return (h.astype(np.float64) / 2.0**64) < rate


def audit_recall(
    corpus: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    cfg: SigConfig,
    sample_rate: float = 0.1,
    seed: int = 1,
) -> RecallAudit:
    """Estimate the pipeline's dup-pair recall at cfg.jaccard_threshold.

    ``edges``: the pipeline's verified (src, dst) output. Cost: the exact
    dedup runs only on the ~p fraction of documents (p² of all pairs).
    """
    thr = cfg.jaccard_threshold

    def keep_sampled(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return batch.filter(pa.array(_sampled(ids, sample_rate, seed)))

    sample = corpus.map_batches(keep_sampled, batch_format="pyarrow")
    truth = ngram_jaccard_pairs(sample, cfg, threshold=thr).to_pandas()
    truth_set = set(zip(truth["src"], truth["dst"]))

    def keep_sampled_edges(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy()
        d = batch.column("dst").to_numpy()
        m = _sampled(s, sample_rate, seed) & _sampled(d, sample_rate, seed)
        return batch.filter(pa.array(m))

    found = edges.map_batches(keep_sampled_edges, batch_format="pyarrow").to_pandas()
    found_set = set(zip(found["src"], found["dst"]))

    n = len(truth_set)
    hit = len(truth_set & found_set)
    if n == 0:
        # no truth pairs in the sample: truth∩found is empty by definition
        # (keep found_pairs_in_sample = |truth∩found| on BOTH branches)
        return RecallAudit(1.0, 0.0, 1.0, 0, 0, sample_rate, thr)
    return RecallAudit(
        recall_estimate=hit / n,
        recall_lb=approx_lower_bound_on_p(n, hit, 2.0),
        recall_ub=approx_upper_bound_on_p(n, hit, 2.0),
        truth_pairs_in_sample=n,
        found_pairs_in_sample=hit,
        sample_rate=sample_rate,
        threshold=thr,
    )
