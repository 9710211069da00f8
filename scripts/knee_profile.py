"""Profile the flagship dedup at the 2.5M-row knee (VERDICT r3 item 8).

Child mode (--child): one fresh Ray session at --cpus over the x--replicas
amplified corpus, one flagship run with the given near mode and
target_max_block_size, then prints one JSON line with wall time, files/s,
object-store spill/restore totals (from Ray's memory summary) and the top
operator wall times (from Dataset.stats()).

Driver mode (default): runs a taskset-pinned child per configuration so
each measurement owns a clean object store, and prints all results. Used to
attribute the throughput knee (plasma spill vs shuffle bandwidth) and pick
the tuning default recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from raydedup.io import read_parquet as _read_parquet  # noqa: E402

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spill_stats() -> dict:
    """Cumulative spilled/restored MiB scraped from this session's
    raylet.out (memory_summary needs grpc, absent in this container).
    The raylet logs a running ':info_message:Spilled N MiB, K objects'
    line — the LAST one is the session total."""
    out = {"spilled_mib": 0.0, "spilled_objects": 0, "restored_mib": 0.0}
    try:
        import ray

        log_dir = ray._private.worker._global_node.get_session_dir_path()
        path = os.path.join(log_dir, "logs", "raylet.out")
        with open(path, errors="replace") as f:
            for line in f:
                m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
                if m:
                    out["spilled_mib"] = float(m.group(1))
                    out["spilled_objects"] = int(m.group(2))
                m = re.search(r"Restored (\d+) MiB", line)
                if m:
                    out["restored_mib"] = float(m.group(1))
    except Exception as ex:  # diagnostics only — never fail the profile
        out["spill_probe_error"] = f"{type(ex).__name__}: {ex}"
    return out


def _top_stages(stats_text: str, n: int = 6) -> list[dict]:
    """Operator name + wall time from Dataset.stats() header lines, e.g.
    'Operator 2 MapBatches(SignatureStage): 60 tasks executed, 60 blocks
    produced in 3.06s'."""
    stages = []
    for line in stats_text.splitlines():
        m = re.match(
            r"Operator (\d+) (.+?): .* in ([\d.]+)(m?s)\s*$", line.strip()
        )
        if m:
            t = float(m.group(3)) * (0.001 if m.group(4) == "ms" else 1.0)
            stages.append({"op": m.group(2)[:90], "sec": round(t, 2)})
    stages.sort(key=lambda s: -s["sec"])
    return stages[:n]


def run_child(cpus: int, replicas: int, mode: str, block_mb: int) -> dict:
    import ray
    import ray.data

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR"
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    if block_mb > 0:
        ctx.target_max_block_size = block_mb * 1024 * 1024
    from raydedup.corpus import amplified_corpus_path
    from raydedup.pipeline import dedup_clusters

    sys.path.insert(0, REPO)
    import bench

    corpus_dir = amplified_corpus_path(SF_DIR, replicas=replicas)
    cfg = bench.bench_config()
    # same warmup as bench.py: steady-state workers, not process spawn
    _read_parquet(corpus_dir).limit(1000).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    t0 = time.time()
    out = dedup_clusters(
        _read_parquet(corpus_dir), cfg, with_substring=False, near_mode=mode
    )
    n = out.count()
    wall = time.time() - t0
    res = {
        "cpus": cpus,
        "rows": n,
        "mode": mode,
        "block_mb": block_mb or "default",
        "wall_sec": round(wall, 1),
        "files_per_sec": round(n / wall, 1),
        **_spill_stats(),
        "top_stages": _top_stages(out.stats()),
    }
    ray.shutdown()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--replicas", type=int, default=499)
    ap.add_argument("--mode", default="bucket")
    ap.add_argument("--block-mb", type=int, default=0, help="0 = Ray default")
    ap.add_argument(
        "--configs",
        default="bucket:0,bucket:32,auto:0",
        help="driver mode: comma list of mode:block_mb children",
    )
    args = ap.parse_args()
    if args.child:
        print(json.dumps(run_child(args.cpus, args.replicas, args.mode, args.block_mb)))
        return

    from raydedup.corpus import amplified_corpus_path

    amplified_corpus_path(SF_DIR, replicas=args.replicas)  # warm cache
    for spec in args.configs.split(","):
        mode, block = spec.split(":")
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            "--cpus",
            str(args.cpus),
            "--replicas",
            str(args.replicas),
            "--mode",
            mode,
            "--block-mb",
            block,
        ]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{args.cpus - 1}", *cmd]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            print(
                f"CHILD FAILED {spec}: rc={proc.returncode} "
                f"stderr tail: {proc.stderr.strip()[-1500:]}",
                flush=True,
            )
            continue
        print(lines[-1], flush=True)


if __name__ == "__main__":
    main()
