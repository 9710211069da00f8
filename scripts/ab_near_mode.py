"""Interleaved A/B of near-tier layouts on the amplified bench corpus.

Runs the flagship dedup_clusters job in fresh pinned processes, alternating
near_mode values so both sides see the same background-load drift, and
prints per-run wall times plus best-of/median per mode. Used to record the
auto-mode (hybrid) vs bucket comparison in BASELINE.md.

Usage:
  python scripts/ab_near_mode.py [--modes bucket,auto] [--repeats 3]
                                 [--replicas 249] [--cpus 24]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(mode: str, cpus: int, replicas: int) -> dict:
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(cpus)
    env["BENCH_FLAGSHIP_ONLY"] = "1"
    env["BENCH_REPLICAS"] = str(replicas)
    env["BENCH_NEAR_MODE"] = mode
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"child (mode={mode}) rc={proc.returncode}; "
            f"stderr tail: {proc.stderr.strip()[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="bucket,auto")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--replicas", type=int, default=249)
    ap.add_argument("--cpus", type=int, default=24)
    args = ap.parse_args()
    modes = args.modes.split(",")

    # warm the corpus cache outside the timed runs
    sys.path.insert(0, REPO)
    from raydedup.corpus import amplified_corpus_path

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplified_corpus_path(sf_dir, replicas=args.replicas)

    samples: dict[str, list[float]] = {m: [] for m in modes}
    rows: dict[str, int] = {}
    for i in range(args.repeats):
        for mode in modes:
            r = one_run(mode, args.cpus, args.replicas)
            t = r["queries"]["dedup_clusters"]
            samples[mode].append(t)
            rows[mode] = r["corpus_rows"]
            print(
                f"round {i + 1} mode={mode:9s} {t:7.1f} s "
                f"({r['files_per_sec']:,.0f} files/s)",
                flush=True,
            )
    out = {"cpus": args.cpus, "corpus_rows": rows, "samples": samples}
    for mode in modes:
        s = samples[mode]
        out[f"{mode}_best"] = min(s)
        out[f"{mode}_median"] = statistics.median(s)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
