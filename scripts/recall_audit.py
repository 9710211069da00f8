"""Dup-pair recall re-measurement on the amplified sf0.1 corpus (round-4,
VERDICT r3 item 2).

The round-2 recall figure (0.9959) was measured at sf0.01 and predates the
span/URL/paragraph tiers. This script re-measures on the BENCH corpus —
amplified sf0.1, 150k files, the flagship production config — with the
full current tier set (exact + near(LSH, salted) + substring), using the
audit methodology of raydedup/audit.py:

* sample documents at rate p with the deterministic per-id hash
  (reproducible; a true pair lands in the sample w.p. p^2);
* ground truth on the sample = EXACT inverted-index n-gram Jaccard pairs
  at the pipeline's threshold (exact copies have J=1, so the sha tier's
  truth is included);
* recall = fraction of truth pairs whose endpooints the full pipeline
  assigns the SAME cluster label (cluster-level — the user-visible
  dedup contract, stronger than edge-level since transitivity must hold);
* binomial 2-sigma bounds via bounds.approx_{lower,upper}_bound_on_p
  (common/BoundsOnBinomialProportions.java formulas).

Prints one JSON line and appends nothing — paste the result into
BASELINE.md. Usage: python scripts/recall_audit.py [sample_rate]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data
from raydedup.io import read_parquet as _read_parquet

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("BENCH_REPLICAS", "29"))
SAMPLE_RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 0.08
SEED = 1


def main() -> int:
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from raydedup.audit import _sampled
    from raydedup.bounds import approx_lower_bound_on_p, approx_upper_bound_on_p
    from raydedup.config import SigConfig
    from raydedup.corpus import amplified_corpus_path
    from raydedup.njaccard import ngram_jaccard_pairs
    from raydedup.pipeline import dedup_clusters

    cfg = SigConfig(kmv_k=128, jaccard_threshold=0.8, kmv_hash_bytes=4)  # bench_config
    corpus_dir = amplified_corpus_path(SF_DIR, replicas=REPLICAS)
    ds = _read_parquet(corpus_dir)
    n_files = ds.count()

    t0 = time.time()
    # full pipeline, every tier, production layout
    labels_df = dedup_clusters(ds, cfg, with_substring=True).to_pandas()
    t_pipeline = time.time() - t0
    label = dict(zip(labels_df["id"], labels_df["cluster_id"]))

    # sampled exact ground truth at the pipeline's threshold
    def keep_sampled(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return batch.filter(pa.array(_sampled(ids, SAMPLE_RATE, SEED)))

    t0 = time.time()
    sample = ds.map_batches(keep_sampled, batch_format="pyarrow")
    n_sample = sample.count()
    truth = ngram_jaccard_pairs(
        sample, cfg, threshold=cfg.jaccard_threshold
    ).to_pandas()
    t_truth = time.time() - t0
    truth_pairs = list(zip(truth["src"], truth["dst"]))

    n = len(truth_pairs)
    hit = sum(1 for a, b in truth_pairs if label[a] == label[b])
    recall = hit / n if n else 1.0
    lb = approx_lower_bound_on_p(n, hit, 2.0) if n else 0.0
    ub = approx_upper_bound_on_p(n, hit, 2.0) if n else 1.0

    print(json.dumps({
        "metric": "dup-pair recall (cluster-level, amplified sf0.1, full tier set)",
        "corpus_files": n_files,
        "sampled_docs": n_sample,
        "sample_rate": SAMPLE_RATE,
        "threshold": cfg.jaccard_threshold,
        "truth_pairs_in_sample": n,
        "co_labeled": hit,
        "recall": round(recall, 6),
        "recall_lb_2sigma": round(lb, 6),
        "recall_ub_2sigma": round(ub, 6),
        "pipeline_sec": round(t_pipeline, 1),
        "truth_sec": round(t_truth, 1),
    }))
    return 0 if recall >= 0.99 else 1


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
