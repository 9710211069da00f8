"""End-to-end fault-injection resume: the north-rule's idempotent-replay
claim as evidence, not design (round-4 verdict item 4).

Two failure modes against the flagship resumable dedup job
(raydedup/manifest.run_dedup_job):

* a WORKER DEATH mid-signature-stage (os._exit inside the shard task —
  Ray retries the task on a fresh worker; the shard's atomic
  tmp+os.replace write makes the replay idempotent), and
* an ABORTED RUN (one shard's task raises; the job surfaces the error
  AFTER recording every shard that did finish), then a resume that
  replays exactly the failed partition.

Both assert bit-identical (id, cluster_id) output vs an undisturbed
golden run and check the replayed-partition counts from the manifest.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydedup.config import SigConfig
from raydedup.manifest import StageCheckpoint, _shard_of_path, run_dedup_job

CFG = SigConfig(kmv_k=64)

_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lamda", "mu", "nu", "xi", "omicron", "pi",
]


def _doc(i: int) -> str:
    toks = [_WORDS[(i * 7 + j * 3) % len(_WORDS)] + str((i + j) % 11) for j in range(30)]
    return " ".join(toks)


def _make_corpus(tmp: str, n_shards: int = 4, rows: int = 25) -> list[str]:
    """Shards with planted CROSS-SHARD duplicates so the edge tiers matter:
    every shard s>0 carries one exact copy and one near-copy (3 tokens
    dropped) of shard 0's first two documents."""
    paths = []
    for s in range(n_shards):
        texts = [_doc(s * rows + r) for r in range(rows)]
        if s > 0:
            texts[0] = _doc(0)
            texts[1] = " ".join(_doc(1).split()[3:])
        tbl = pa.table(
            {
                "id": pa.array(range(s * rows, (s + 1) * rows), pa.int64()),
                "content": pa.array(texts),
            }
        )
        p = os.path.join(tmp, f"input-{s:03d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


def _read_assignments(out_dir: str):
    import ray.data

    df = ray.data.read_parquet(out_dir).to_pandas()
    df = df.sort_values("id").reset_index(drop=True)
    return df


class _KillOnceStage:
    """SignatureStage wrapper whose first worker-side call dies with
    os._exit(1) — a hard worker death, not a Python exception — exactly
    once per sentinel file. Ray must retry the task transparently."""

    def __init__(self, cfg: SigConfig, sentinel: str):
        from raydedup.stages import SignatureStage

        self._inner = SignatureStage(cfg)
        self._sentinel = sentinel

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            with open(self._sentinel, "x"):
                pass
        except FileExistsError:
            return self._inner(batch)
        os._exit(1)


def test_worker_death_mid_signatures_is_retried(ray_session, tmp_path, monkeypatch):
    import pandas as pd

    import raydedup.manifest as manifest_mod

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    files = _make_corpus(inp)

    golden_dir = run_dedup_job(files, str(tmp_path / "ck_gold"), CFG)
    golden = _read_assignments(golden_dir)
    assert len(golden) == 100
    assert golden["cluster_id"].nunique() < 100  # planted dups clustered

    sentinel = str(tmp_path / "killed-once")
    ck = str(tmp_path / "ck_kill")
    monkeypatch.setattr(
        manifest_mod,
        "SignatureStage",
        lambda cfg: _KillOnceStage(cfg, sentinel),
    )
    out_dir = run_dedup_job(files, ck, CFG)

    assert os.path.exists(sentinel), "fault was never injected"
    got = _read_assignments(out_dir)
    pd.testing.assert_frame_equal(got, golden)
    # every shard has exactly one ok manifest row despite the death+retry
    ckpt = StageCheckpoint(ck, "signatures", CFG)
    rows = ckpt.manifest_rows()
    assert sorted(r["shard"] for r in rows) == sorted(_shard_of_path(p) for p in files)


def test_abort_mid_job_then_resume_is_bit_identical(ray_session, tmp_path):
    import pandas as pd

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    files = _make_corpus(inp)

    golden = _read_assignments(run_dedup_job(files, str(tmp_path / "ck_gold"), CFG))

    # poison shard 2: unreadable parquet → its task raises an application
    # error (not retried); the job must record the shards that DID finish
    # before surfacing the failure
    victim = files[2]
    original = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")

    ck = str(tmp_path / "ck_crash")
    with pytest.raises(RuntimeError, match="checkpointed"):
        run_dedup_job(files, ck, CFG)

    ckpt = StageCheckpoint(ck, "signatures", CFG)
    done_after_crash = ckpt.done_shards()
    assert done_after_crash == {_shard_of_path(p) for p in files if p != victim}
    assert len(done_after_crash) == 3

    # resume after repairing the input: exactly ONE partition is replayed
    with open(victim, "wb") as f:
        f.write(original)
    out_dir = run_dedup_job(files, ck, CFG)

    rows = ckpt.manifest_rows()
    assert len(rows) == 4  # 3 pre-crash + 1 replayed, no duplicates
    replayed = [r["shard"] for r in rows if r["shard"] not in done_after_crash]
    assert replayed == [_shard_of_path(victim)]

    got = _read_assignments(out_dir)
    pd.testing.assert_frame_equal(got, golden)
    assert (got["cluster_id"].to_numpy() == golden["cluster_id"].to_numpy()).all()
