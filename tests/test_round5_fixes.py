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
    h = put_broadcast(arr)  # small → inlined by value (zero store deps)
    np.testing.assert_array_equal(broadcast_value(h), arr)
    h = put_broadcast(np.zeros(1 << 18))  # big → one plasma copy
    assert isinstance(h, dict)
    assert broadcast_value(h).shape == (1 << 18,)
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


def test_ann_topk_constructor_kwargs_hold_no_store_refs(ray_session):
    """AnnScorer's OWN constructor kwargs add no object-store dependency:
    put_broadcast inlines query matrices of realistic size by value. (The
    bench-tail `core_worker.cc:2246` line itself cannot be eliminated —
    Ray Data ray.puts its map transformer and passes that ref to every
    map actor, actor_pool_map_operator.py:295, so the warning fires even
    for a kwargs-free actor-pool stage; the transformer ref is
    driver-owned, same lifetime argument as our big broadcasts.)"""
    import ray.data

    from raydedup.io import put_broadcast
    from raydedup.embed import ann_topk

    rng = np.random.default_rng(11)
    q = rng.normal(size=(2, 8))
    assert isinstance(put_broadcast(np.asarray(q, dtype=np.float64)), np.ndarray)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(500, dtype=np.int64)),
            "embedding": pa.array(list(rng.normal(size=(500, 8)))),
        }
    )
    ds = ray.data.from_arrow(emb).repartition(4)
    res = ann_topk(ds, q, np.arange(2, dtype=np.int64), k=3)
    assert res.num_rows == 6


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


def _fp_pairs_reference(fps, ids, max_bucket, cross_min_id=None):
    """Scalar reference for the fp-bucket pair kernel (the pre-round-5
    per-bucket loop, kept as the parity oracle)."""
    order = np.lexsort((ids, fps))
    fps, ids = fps[order], ids[order]
    n = len(fps)
    new_run = np.concatenate([[True], fps[1:] != fps[:-1]])
    starts = np.flatnonzero(new_run)
    ends = np.concatenate([starts[1:], [n]])
    out = []
    for s, e in zip(starts, ends):
        u = np.unique(ids[s:e])
        m = len(u)
        if m < 2:
            continue
        if m > max_bucket:
            out += [(u[0], d) for d in u[1:]]
        else:
            out += [(u[i], u[j]) for i in range(m) for j in range(i + 1, m)]
    if cross_min_id is not None:
        out = [(s, d) for s, d in out if s >= cross_min_id or d >= cross_min_id]
    return sorted(out)


@pytest.mark.parametrize("cross_min_id", [None, 50])
def test_fp_block_pairs_vectorized_parity(cross_min_id):
    from raydedup.pipeline import _fp_block_pairs

    rng = np.random.default_rng(42)
    # heavy-tailed bucket sizes: many singletons/pairs, a few big runs,
    # one over-max_bucket star run, plus duplicated (fp, id) postings
    fps, ids = [], []
    fp = 0
    for size in [1] * 200 + [2] * 150 + [3] * 40 + [4] * 10 + [7, 12, 30]:
        fp += 1
        members = rng.choice(200, size=size, replace=False)
        fps += [fp] * size
        ids += list(members)
    # star run above max_bucket=8
    fps += [9999] * 20
    ids += list(rng.choice(500, size=20, replace=False))
    # duplicated postings (guard path)
    fps += [3, 3]
    ids += [ids[fps.index(3)]] * 2
    fps = np.array(fps, dtype=np.uint64)
    ids = np.array(ids, dtype=np.int64)

    perm = rng.permutation(len(fps))
    block = pa.table({"fp": pa.array(fps[perm]), "id": pa.array(ids[perm])})
    got = _fp_block_pairs(8, cross_min_id)(block)
    got_pairs = sorted(
        zip(got.column("src").to_pylist(), got.column("dst").to_pylist())
    )
    assert got_pairs == _fp_pairs_reference(fps, ids, 8, cross_min_id)
    # pairs are (min, other): src < dst everywhere
    assert all(s < d for s, d in got_pairs)


def test_fp_block_pairs_empty_and_singletons():
    from raydedup.pipeline import _fp_block_pairs

    emit = _fp_block_pairs(8)
    empty = pa.table({"fp": pa.array([], pa.uint64()), "id": pa.array([], pa.int64())})
    assert emit(empty).num_rows == 0
    singles = pa.table(
        {"fp": pa.array([1, 2, 3], pa.uint64()), "id": pa.array([7, 8, 9], pa.int64())}
    )
    assert emit(singles).num_rows == 0


def test_bpe_lenient_mode(ray_session):
    """strict=False restores the pre-round-4 lenient OOV contract:
    tokenize counts OOV tokens as 0; encode passes the word through
    unsegmented as one symbol."""
    import ray.data

    from raydedup.bpe import bpe_encode_docs, tokenize_with_merges, train_bpe

    train = pa.table(
        {
            "id": pa.array([0, 1], pa.int64()),
            "content": pa.array(["low lower lowest", "low low newer"]),
        }
    )
    tr = train_bpe(ray.data.from_arrow(train), n_merges=3)
    apply_tbl = pa.table(
        {
            "id": pa.array([10, 11], pa.int64()),
            "content": pa.array(["low UNSEEN", "lower"]),
        }
    )
    ds = ray.data.from_arrow(apply_tbl)
    with pytest.raises(Exception):  # strict default raises on OOV
        tokenize_with_merges(ds, tr).to_pandas()
    tok = tokenize_with_merges(ds, tr, strict=False).to_pandas()
    tok = dict(zip(tok["id"], tok["n_bpe"]))
    strict_known = tokenize_with_merges(
        ray.data.from_arrow(
            pa.table({"id": pa.array([11], pa.int64()), "content": pa.array(["lower"])})
        ),
        tr,
    ).to_pandas()
    assert tok[11] == strict_known["n_bpe"].iloc[0]  # known rows unchanged
    lone_low = tokenize_with_merges(
        ray.data.from_arrow(
            pa.table({"id": pa.array([0], pa.int64()), "content": pa.array(["low"])})
        ),
        tr,
    ).to_pandas()["n_bpe"].iloc[0]
    assert tok[10] == lone_low  # UNSEEN contributed 0

    enc = bpe_encode_docs(ds, tr, strict=False).to_pandas()
    enc = dict(zip(enc["id"], zip(enc["bpe_text"], enc["n_bpe"])))
    assert "UNSEEN" in enc[10][0]  # passed through unsegmented
    assert enc[10][1] == lone_low + 1  # one extra symbol for the OOV word


def test_global_ranks_with_count(ray_session):
    import ray.data

    from raydedup.scan import global_ranks, global_ranks_with_count

    t = pa.table(
        {
            "id": pa.array(np.arange(20, dtype=np.int64)),
            "score": pa.array((np.arange(20) % 7).astype(np.float64)),
        }
    )
    ranked, n = global_ranks_with_count(ray.data.from_arrow(t), "score", "id")
    assert n == 20
    a = ranked.to_pandas().sort_values("id").reset_index(drop=True)
    b = (
        global_ranks(ray.data.from_arrow(t), "score", "id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_put_broadcast_inlines_small_refs_big(ray_session):
    """ray#53727 follow-up: nesting a ref in a dict does NOT dodge the
    dependency tracking (verified empirically), so put_broadcast now keeps
    SMALL payloads by value — zero object-store dependencies in the actor
    creation spec — and only big payloads go to plasma (driver-owned, so
    the primary copy's lifetime is the job's). The residual core_worker
    warning on every actor-pool stage is Ray Data's own transformer
    ray.put (actor_pool_map_operator.py:295) and fires even for a
    kwargs-free stage — unfixable from library code."""
    import ray

    from raydedup.io import _BROADCAST_KEY, broadcast_value, put_broadcast

    small = np.arange(128, dtype=np.float64)  # 1 KB
    h = put_broadcast(small)
    assert isinstance(h, np.ndarray)  # by value, no store dependency
    assert (broadcast_value(h) == small).all()

    big = np.zeros(1 << 18, dtype=np.float64)  # 2 MB
    h = put_broadcast(big)
    assert isinstance(h, dict) and isinstance(h[_BROADCAST_KEY], ray.ObjectRef)
    assert broadcast_value(h).shape == big.shape

    # tuple payloads (the pipeline sketch-table shape) size up recursively
    tup = (np.arange(8, dtype=np.uint64), np.arange(8, dtype=np.uint64))
    assert isinstance(put_broadcast(tup), tuple)
    mixed = (np.zeros(1 << 17, dtype=np.uint64), np.arange(8, dtype=np.uint64))
    assert isinstance(put_broadcast(mixed), dict)


def test_rolling_gram_hash_scalar_reference():
    """The O(T) rolling winnow gram hash matches an independent scalar
    evaluation of its definition (h_i = splitmix64(seed-fold of
    Σ_j tok[i+j]·B^j · B^-i mod 2^64)) and is position-independent:
    equal k-token windows hash equal anywhere in the stream."""
    from raydedup.hashing import splitmix64
    from raydedup.winnow import _gram_hashes

    rng = np.random.default_rng(5)
    k, T = 7, 200
    tok = rng.integers(0, 2**63, T, dtype=np.uint64)
    tok[100 : 100 + k] = tok[40 : 40 + k]  # planted equal window
    h = _gram_hashes(tok, k, seed=42)
    assert h[100] == h[40]

    B, M = 0x9E3779B97F4A7C15, (1 << 64) - 1
    seed_mix = int(splitmix64(np.array([42], dtype=np.uint64))[0])
    for i in (0, 1, 40, 100, T - k):
        # Σ_j tok[i+j]·B^j — local exponents, already position-normalized
        core = 0
        for j in range(k):
            core = (core + int(tok[i + j]) * pow(B, j, 1 << 64)) & M
        expect = int(splitmix64(np.array([core ^ seed_mix], dtype=np.uint64))[0])
        assert int(h[i]) == expect, i
