"""Snapshot diff (raydedup/snapshot.py) vs a dict brute force, incl. all
four classes, empty sides, and the planted delta fixture."""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _brute(base: dict[int, str], new: dict[int, str]) -> dict[int, str]:
    sha = lambda s: hashlib.sha256(s.encode()).hexdigest()
    out = {}
    for i in set(base) | set(new):
        if i not in new:
            out[i] = "removed"
        elif i not in base:
            out[i] = "added"
        elif sha(base[i]) != sha(new[i]):
            out[i] = "changed"
        else:
            out[i] = "unchanged"
    return out


def _ds(ray, docs: dict[int, str]):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(docs), pa.int64()),
                "content": pa.array([docs[i] for i in docs], pa.string()),
            }
        )
    )


def _run(ray, base, new):
    from raydedup.snapshot import snapshot_diff

    t = snapshot_diff(_ds(ray, base), _ds(ray, new)).to_pandas()
    return dict(zip(t["id"].astype(int), t["status"]))


def test_snapshot_diff_bruteforce(ray_session):
    import ray

    base = {1: "alpha", 2: "beta", 3: "gamma", 4: "delta", 5: ""}
    new = {2: "beta", 3: "gamma CHANGED", 5: "", 6: "added doc", 7: ""}
    got = _run(ray, base, new)
    assert got == _brute(base, new)
    assert got[1] == "removed" and got[6] == "added"
    assert got[3] == "changed" and got[2] == "unchanged" and got[5] == "unchanged"


def test_snapshot_diff_empty_sides(ray_session):
    import ray

    docs = {1: "a", 2: "b"}
    assert _run(ray, docs, {10: "x"}) == {1: "removed", 2: "removed", 10: "added"}


def test_snapshot_diff_fixture(ray_session):
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from raydedup.corpus import corpus_parquet_path
    from raydedup.snapshot import delta_parquet_path, snapshot_diff

    sf = "/root/testdata/sf0.001"
    bpath, dpath = corpus_parquet_path(sf), delta_parquet_path(sf)
    base = dict(
        zip(
            *(
                pq.read_table(bpath, columns=["id", "content"])
                .column(c)
                .to_pylist()
                for c in ("id", "content")
            )
        )
    )
    new = dict(
        zip(
            *(
                pq.read_table(dpath, columns=["id", "content"]).column(c).to_pylist()
                for c in ("id", "content")
            )
        )
    )
    got = _run(
        ray,
        base,
        new,
    )
    # run on the actual datasets too (same inputs through Ray reads)
    t = snapshot_diff(
        ray.data.read_parquet(bpath, columns=["id", "content"]),
        ray.data.read_parquet(dpath),
    ).to_pandas()
    got_ds = dict(zip(t["id"].astype(int), t["status"]))
    want = _brute(base, new)
    assert got == want and got_ds == want
    from collections import Counter

    c = Counter(want.values())
    assert min(c["added"], c["removed"], c["changed"], c["unchanged"]) > 5
