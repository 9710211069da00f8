"""select_survivors (raydedup/curate.py): per-cluster best-quality member
vs brute force — score ties broken by smallest id, inner-join semantics,
multi-partition tagged-union merge."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_select_survivors_matches_bruteforce(ray_session):
    import ray.data

    from raydedup.curate import select_survivors

    rng = np.random.default_rng(23)
    n = 3_000
    ids = np.arange(n, dtype=np.int64)
    clusters = rng.integers(0, 400, n).astype(np.int64)
    # coarse scores → many exact ties inside clusters
    quality = np.floor(rng.random(n) * 8) / 8
    assign = pa.table({"id": ids, "cluster_id": clusters})
    # scores: shuffled row order, plus ids NOT in assign (must be ignored),
    # minus a few assign ids (those rows drop out, inner semantics)
    extra = pa.table(
        {"id": np.arange(n, n + 50, dtype=np.int64),
         "quality": np.ones(50)}
    )
    perm = rng.permutation(n)
    missing = set(rng.choice(n, 25, replace=False).tolist())
    keep = np.array([i for i in perm if i not in missing])
    scores = pa.concat_tables(
        [pa.table({"id": ids[keep], "quality": quality[keep]}), extra]
    )

    out = (
        select_survivors(
            ray.data.from_arrow(assign).repartition(9),
            ray.data.from_arrow(scores).repartition(4),
        )
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )

    best: dict[int, tuple[float, int]] = {}
    for i in range(n):
        if i in missing:
            continue
        key = (-quality[i], i)
        c = clusters[i]
        if c not in best or key < best[c]:
            best[c] = key
    want = sorted((c, i, -negq) for c, (negq, i) in best.items())
    got = list(out[["cluster_id", "survivor_id", "quality"]]
               .itertuples(index=False, name=None))
    assert sorted(got) == want
    # ids present only in scores never surface
    assert out["survivor_id"].max() < n
