"""Scale stress for the round-4 vector operators: distributed k-means,
SemDeDup and the fixed-point logistic-regression classifier on a synthetic
1M x 64 embedding corpus (the sf tables top out at 2k vectors — far too
small to exercise the distributed paths).

Writes the corpus once to /tmp as sharded parquet (seeded, resumable),
then times each operator in one Ray session and prints one JSON line.
Run pinned: taskset -c 0-23 python scripts/cluster_bench.py --cpus 24
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
from raydedup.io import read_parquet as _read_parquet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = "/tmp/raydedup/vecbench"


def build_corpus(n_rows: int, dim: int, n_blobs: int, shard_rows: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(OUT, f"n{n_rows}_d{dim}_b{n_blobs}")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(4242)
    centers = rng.normal(size=(n_blobs, dim)) * 0.3
    for s0 in range(0, n_rows, shard_rows):
        s1 = min(s0 + shard_rows, n_rows)
        ids = np.arange(s0, s1, dtype=np.int64)
        blob = ids % n_blobs
        v = centers[blob] + rng.normal(size=(s1 - s0, dim)) * 0.05
        # plant exact dups: every 37th row copies the previous row's vector
        dup = (ids % 37 == 0) & (ids > s0)
        v[dup] = v[np.flatnonzero(dup) - 1]
        v = np.clip(v, -0.99, 0.99).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(list(v.astype(float))),
                "y": pa.array((blob == 0).astype(np.int64)),
            }
        )
        pq.write_table(t, os.path.join(out, f"part-{s0:010d}.parquet"))
    open(done, "w").close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=256)
    args = ap.parse_args()

    corpus = build_corpus(args.rows, args.dim, n_blobs=32, shard_rows=100_000)

    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    from raydedup.classifier import logreg_scores, train_logreg
    from raydedup.cluster import kmeans_assign, kmeans_fit, semdedup

    def read():
        return _read_parquet(corpus)

    res = {"rows": args.rows, "dim": args.dim, "k": args.k, "cpus": args.cpus}

    t0 = time.time()
    cent = kmeans_fit(read(), k=args.k, n_iter=2)
    res["kmeans_fit_2iter_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    n = kmeans_assign(read(), cent).count()
    assert n == args.rows
    res["kmeans_assign_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    sd = semdedup(read(), cent, threshold=0.999)
    import pyarrow.compute as pc

    dropped = 0
    total = 0
    for b in sd.iter_batches(batch_format="pyarrow", batch_size=65536):
        dropped += int(pc.sum(pc.invert(b.column("kept"))).as_py() or 0)
        total += b.num_rows
    res["semdedup_sec"] = round(time.time() - t0, 1)
    res["semdedup_rows"] = total
    res["semdedup_dropped"] = dropped

    t0 = time.time()
    w_q, b_q = train_logreg(read(), label_col="y", n_iter=2, lr=0.5, dim=args.dim)
    res["logreg_train_2iter_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    assert logreg_scores(read(), w_q, b_q).count() == args.rows
    res["logreg_score_sec"] = round(time.time() - t0, 1)

    # IVF-PQ: quantizers trained on ONE 100k shard (the sampled-training
    # path), full corpus encoded once into a codes-only persisted index,
    # then a 32-query probe that reads only nprobe/n_lists of the lists
    import shutil

    from raydedup.ivfpq import ann_topk_ivfpq_indexed, write_ivfpq_index

    idx = os.path.join(OUT, f"ivfpq_{args.rows}_{args.cpus}")
    shutil.rmtree(idx, ignore_errors=True)
    sample = _read_parquet(
        os.path.join(corpus, f"part-{0:010d}.parquet")
    )
    t0 = time.time()
    write_ivfpq_index(
        read(), idx, n_lists=32, m=8, k_codes=256,
        n_iter_coarse=2, n_iter_pq=2, train_ds=sample,
    )
    res["ivfpq_build_sec"] = round(time.time() - t0, 1)
    raw_bytes = sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    idx_bytes = sum(
        os.path.getsize(os.path.join(idx, "lists", f))
        for f in os.listdir(os.path.join(idx, "lists"))
    )
    res["ivfpq_index_mb"] = round(idx_bytes / 1e6, 1)
    res["ivfpq_corpus_mb"] = round(raw_bytes / 1e6, 1)
    rng = np.random.default_rng(7)
    q_ids = rng.choice(args.rows, size=32, replace=False)
    q_ids.sort()
    import pyarrow.parquet as pqt

    qvecs = []
    for qid in q_ids:
        shard = (qid // 100_000) * 100_000
        t = pqt.read_table(
            os.path.join(corpus, f"part-{shard:010d}.parquet"),
            columns=["vec_id", "embedding"],
        )
        qvecs.append(t.column("embedding")[int(qid - shard)].as_py())
    qvecs = np.asarray(qvecs, dtype=np.float64)
    t0 = time.time()
    out = ann_topk_ivfpq_indexed(idx, qvecs, q_ids, k=10, nprobe=4).to_pandas()
    res["ivfpq_query32_nprobe4_sec"] = round(time.time() - t0, 1)
    own = sum(
        int(q in set(out[out["query_id"] == q]["vec_id"])) for q in q_ids
    )
    res["ivfpq_self_recall_32"] = own  # corpus-member queries finding themselves

    for key in (
        "kmeans_fit_2iter_sec",
        "semdedup_sec",
        "logreg_train_2iter_sec",
        "ivfpq_build_sec",
    ):
        res[key.replace("_sec", "_rows_per_sec")] = round(args.rows / res[key], 0)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
