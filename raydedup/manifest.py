"""Per-partition lineage manifests + checkpoint/resume.

North_rule requirements implemented here:

* **Stage checkpoints** — signature output is written as Parquet partitioned
  by input shard (``shard=<input file stem>/``), so a partition is exactly
  one input file's worth of work.
* **Per-partition lineage manifest** — one JSONL row per completed shard:
  row counts, byte sizes, sketch metrics (distinct-shingle HLL estimate,
  token-count KLL quantiles) and the config fingerprint.
* **Idempotent replay** — on resume, shards with a valid manifest row are
  skipped; missing/failed shards are recomputed from their input file
  alone. The config fingerprint is part of the checkpoint path, so outputs
  from different shingle/signature configs can never mix (the engine's
  seedHash rule, thetacommon/ThetaUtil.java:93-109).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .config import SigConfig
from .hashing import splitmix64
from .sketches.hll import HllSketch
from .sketches.kll import KllSketch
from .stages import SignatureStage


class StageCheckpoint:
    def __init__(self, root: str, stage: str, cfg: SigConfig):
        self.cfg = cfg
        self.dir = os.path.join(root, f"fp={cfg.fingerprint:016x}", stage)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "manifest.jsonl")

    def manifest_rows(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        rows = []
        with open(self.manifest_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        return rows

    def done_shards(self) -> set[str]:
        return {
            r["shard"]
            for r in self.manifest_rows()
            if r.get("status") == "ok"
            and r.get("config_fingerprint") == f"{self.cfg.fingerprint:016x}"
        }

    def shard_dir(self, shard: str) -> str:
        return os.path.join(self.dir, f"shard={shard}")

    def invalidate_shard(self, shard: str) -> None:
        """Drop a shard's outputs + manifest row (for forced replay)."""
        if os.path.isdir(self.shard_dir(shard)):
            shutil.rmtree(self.shard_dir(shard))
        rows = [r for r in self.manifest_rows() if r["shard"] != shard]
        with open(self.manifest_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def record(self, shard: str, **fields) -> None:
        row = {
            "shard": shard,
            "status": "ok",
            "config_fingerprint": f"{self.cfg.fingerprint:016x}",
            **fields,
        }
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(row) + "\n")


def _shard_of_path(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _shard_metrics(tbl: pa.Table, kmv_hash_bytes: int = 8) -> dict:
    """Lineage metrics for one shard's signature output.

    ``kmv_hash_bytes`` must come from the stage config: the cell width
    cannot be inferred from buffer length (any even count of 4-byte cells
    is also 8-aligned)."""
    n_tokens = tbl.column("n_tokens").to_numpy().astype(np.float64)
    kll = KllSketch(k=200)
    kll.update_many(n_tokens)
    hll = HllSketch(lg_k=12)
    # distinct shingles across the shard: feed per-row minhash words is
    # wrong; use simhash+kmv? The kmv column holds per-row bottom-k hashes —
    # feeding their union is a theta-style distinct estimate of shingles.
    blobs = tbl.column("kmv").to_pylist()
    if blobs:
        raw = b"".join(blobs)
        if kmv_hash_bytes == 8:
            allh = np.frombuffer(raw, dtype="<u8").astype(np.uint64)
        else:
            allh = np.frombuffer(raw, dtype="<u4").astype(np.uint64) << np.uint64(32)
        # remix to fill all 64 bits uniformly: theta hashes are 63-bit and
        # HllSketch reads disjoint low(index)/high(rho) bit fields
        hll.update_hashes(splitmix64(allh))
    return {
        "rows": tbl.num_rows,
        "bytes": tbl.nbytes,
        "token_count_quantiles": kll.quantiles([0.5, 0.9, 0.99]),
        "distinct_shingle_est": round(hll.estimate(), 1),
    }


def resumable_signatures(
    input_files: list[str],
    ckpt_root: str,
    cfg: SigConfig,
) -> "ray.data.Dataset":
    """Signature stage with shard-level checkpoint/resume.

    Processes only input files without a valid manifest row; each shard's
    output lands in its own directory and gets a manifest row with metrics.
    Returns the full signatures Dataset (reading the checkpoint).
    """
    ckpt = StageCheckpoint(ckpt_root, "signatures", cfg)
    done = ckpt.done_shards()
    pending = [f for f in input_files if _shard_of_path(f) not in done]

    if pending:
        stage = SignatureStage(cfg)

        @ray.remote
        def process_shard(path: str) -> tuple[str, dict]:
            import pyarrow.parquet as pq

            shard = _shard_of_path(path)
            tbl = pq.read_table(path)
            out = stage(tbl)
            out_dir = os.path.join(ckpt.dir, f"shard={shard}")
            os.makedirs(out_dir, exist_ok=True)
            tmp = os.path.join(out_dir, f".tmp-{os.getpid()}.parquet")
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(out_dir, "part-0.parquet"))
            return shard, _shard_metrics(out, cfg.kmv_hash_bytes)

        # one task per shard: shard = unit of retry/replay; Ray schedules
        # them like any map stage (a shard is sized like a block)
        futures = [process_shard.remote(p) for p in pending]
        for shard, metrics in ray.get(futures):
            ckpt.record(shard, **metrics)

    import glob

    shard_files = sorted(glob.glob(os.path.join(ckpt.dir, "shard=*", "*.parquet")))
    return ray.data.read_parquet(shard_files)


def run_dedup_job(
    input_files: list[str],
    ckpt_root: str,
    cfg: SigConfig,
    *,
    with_substring: bool = True,
    with_salting: bool = True,
) -> str:
    """End-to-end resumable dedup job: shard-checkpointed signatures →
    tiers → union-find → partitioned cluster output + manifests.

    Re-running after a crash reuses every completed signature shard and
    rewrites only the (cheap, edge-level) downstream stages — the unit of
    replay is one input file (north_rule idempotent-partition semantics).
    Returns the cluster output directory.
    """
    from .pipeline import detect_hot_band_keys, exact_edges, near_edges, substring_edges
    from .unionfind import cluster_edges

    sigs = resumable_signatures(input_files, ckpt_root, cfg).materialize()
    hot = detect_hot_band_keys(sigs, cfg) if with_salting else None
    edges = exact_edges(sigs).union(
        near_edges(sigs, cfg, hot).select_columns(["src", "dst"])
    )
    if with_substring:
        edges = edges.union(substring_edges(sigs, cfg))
    edges = edges.materialize()
    assigned = cluster_edges(edges, method="auto")

    def defaults(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch.column("id"), "cluster_id": batch.column("id")})

    full = (
        sigs.select_columns(["id"])
        .map_batches(defaults, batch_format="pyarrow")
        .union(assigned)
        .groupby("id")
        .min("cluster_id")
        .map_batches(
            lambda b: pa.table(
                {"id": b.column("id"), "cluster_id": b.column("min(cluster_id)")}
            ),
            batch_format="pyarrow",
        )
    )
    return write_clusters_checkpoint(full, ckpt_root, cfg)


def write_clusters_checkpoint(
    assignments: "ray.data.Dataset", ckpt_root: str, cfg: SigConfig
) -> str:
    """Final (id, cluster_id) output as partitioned parquet + manifest."""
    ckpt = StageCheckpoint(ckpt_root, "clusters", cfg)
    out_dir = os.path.join(ckpt.dir, "data")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    assignments.write_parquet(out_dir)
    n = ray.data.read_parquet(out_dir).count()
    ckpt.record("clusters", rows=n)
    return out_dir
