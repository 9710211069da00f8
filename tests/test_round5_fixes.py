"""Round-5 fix regressions: broadcast handles (ray#53727 actor-restart
hazard), metadata-free parquet reads (schema-hash warning), and the
vectorized fp-bucket pair kernel."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_put_broadcast_roundtrip(ray_session):
    from raydedup.io import broadcast_value, put_broadcast

    arr = np.arange(100, dtype=np.float64)
    h = put_broadcast(arr)
    assert isinstance(h, dict)
    np.testing.assert_array_equal(broadcast_value(h), arr)
    # plain values and bare refs resolve too (direct-construction tests)
    np.testing.assert_array_equal(broadcast_value(arr), arr)
    import ray

    np.testing.assert_array_equal(broadcast_value(ray.put(arr)), arr)


def test_actor_pool_stage_survives_kill_and_restart(ray_session):
    """An actor whose constructor takes a put_broadcast handle restarts
    cleanly after ray.kill: the creation-task args are inline (no
    object-store dependency — the ray#53727 hazard), and __init__
    re-fetches the broadcast payload itself."""
    import ray

    from raydedup.embed import AnnScorer
    from raydedup.io import put_broadcast

    rng = np.random.default_rng(7)
    q = rng.normal(size=(3, 8))
    handle = put_broadcast(q)

    Actor = ray.remote(max_restarts=1, max_task_retries=1)(AnnScorer)
    a = Actor.remote(handle, np.arange(3, dtype=np.int64), 2)

    batch = pa.table(
        {
            "vec_id": pa.array(np.arange(20, dtype=np.int64)),
            "embedding": pa.array(list(rng.normal(size=(20, 8)))),
        }
    )
    before = ray.get(a.__call__.remote(batch))
    ray.kill(a, no_restart=False)
    after = ray.get(a.__call__.remote(batch))  # restarted actor re-inits
    assert after.equals(before)


def test_ann_topk_emits_no_restart_hazard(ray_session, capfd):
    """The bench-tail `core_worker.cc:2246` error is gone: AnnScorer's
    constructor kwargs no longer hold object-store args."""
    import ray.data

    from raydedup.embed import ann_topk

    rng = np.random.default_rng(11)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(500, dtype=np.int64)),
            "embedding": pa.array(list(rng.normal(size=(500, 8)))),
        }
    )
    ds = ray.data.from_arrow(emb).repartition(4)
    res = ann_topk(ds, rng.normal(size=(2, 8)), np.arange(2, dtype=np.int64), k=3)
    assert res.num_rows == 6
    err = capfd.readouterr().err
    assert "has constructor arguments in the object store" not in err


def test_read_parquet_strips_schema_metadata(ray_session, tmp_path):
    """raydedup.io.read_parquet yields hashable block schemas (this
    pyarrow's Schema.__hash__ raises on any schema metadata, which kills
    Ray's schema dedup and warns from every block concat)."""
    import pandas as pd

    from raydedup.io import read_parquet

    path = str(tmp_path / "t.parquet")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(path)
    assert pq.read_schema(path).metadata  # pandas wrote metadata
    with pytest.raises(TypeError):
        hash(pq.read_schema(path))

    ds = read_parquet(path)
    tables = ds.take_batch(10, batch_format="pyarrow")
    assert tables.schema.metadata is None
    hash(tables.schema)  # must not raise
    assert sorted(tables.column("a").to_pylist()) == [1, 2, 3]
