"""SimHash dedup, FDT, recall audit, KS test, adaptor post-ops."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import SigConfig
from raydedup.hashing import hash_to_double, hash_to_int_range, splitmix64
from raydedup.sketches.kll import KllSketch

CFG = SigConfig(kmv_k=64, jaccard_threshold=0.7, max_bucket_size=64)


def test_adaptor_postops():
    h = splitmix64(np.arange(10000, dtype=np.uint64))
    ints = hash_to_int_range(h, 7)
    assert ints.min() >= 0 and ints.max() < 7
    # roughly uniform
    counts = np.bincount(ints, minlength=7)
    assert counts.min() > 1000
    d = hash_to_double(h)
    assert d.min() >= 0.0 and d.max() < 1.0
    assert abs(d.mean() - 0.5) < 0.02


def test_ks_same_vs_shifted():
    rng = np.random.default_rng(0)
    a, b, c = KllSketch(200), KllSketch(200), KllSketch(200)
    a.update_many(rng.standard_normal(50_000))
    b.update_many(rng.standard_normal(50_000))
    c.update_many(rng.standard_normal(50_000) + 0.5)
    assert not KllSketch.ks_test(a, b)
    assert KllSketch.ks_test(a, c)
    assert KllSketch.ks_delta(a, c) > KllSketch.ks_delta(a, b)


def test_simhash_dup_pairs(ray_session):
    import ray.data

    from raydedup.simdedup import simhash_dup_pairs

    rng = np.random.default_rng(1)
    vocab = [f"t{i}" for i in range(400)]
    contents, ids = [], []
    for i in range(40):
        toks = [vocab[j] for j in rng.integers(0, 400, 200)]
        ids.append(2 * i)
        contents.append(" ".join(toks))
        mut = list(toks)
        mut[3] = vocab[int(rng.integers(400))]  # 1-token change → small hamming
        ids.append(2 * i + 1)
        contents.append(" ".join(mut))
    tbl = pa.table({"id": pa.array(ids, pa.int64()), "content": pa.array(contents)})
    out = simhash_dup_pairs(ray.data.from_arrow(tbl), CFG, max_hamming=10).to_pandas()
    got = set(zip(out["src"], out["dst"]))
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    # most 1-token-in-200 mutations stay within hamming 10
    assert len(got & planted) >= 30
    assert (out["hamming"] <= 10).all()


def test_fdt(ray_session):
    import ray.data

    from raydedup.fdt import frequent_distinct_tuples

    rng = np.random.default_rng(2)
    n = 5000
    grp = rng.integers(0, 20, n).astype(np.int64)
    # group g sees ~g*5 distinct values
    val = np.array([rng.integers(0, (g + 1) * 5) for g in grp], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"g": pa.array(grp), "v": pa.array(val)}))
    out = frequent_distinct_tuples(ds, ["g"], "v", k=4096, limit=5).to_pandas()
    assert len(out) == 5
    import pandas as pd

    pdf = pa.table({"g": pa.array(grp), "v": pa.array(val)}).to_pandas()
    want = pdf.groupby("g")["v"].nunique().sort_values(ascending=False)
    assert list(out["g"]) == list(want.index[:5])
    assert (out["lb"] <= out["distinct_est"]).all()
    assert (out["distinct_est"] <= out["ub"]).all()


def test_audit_recall(ray_session):
    import ray.data

    from raydedup.audit import audit_recall
    from raydedup.pipeline import dedup_clusters, near_edges, signatures
    from tests.test_pipeline_ray import _mini_corpus

    tbl = _mini_corpus(n_base=50)
    cfg = SigConfig(
        kmv_k=256, winnow_k=8, winnow_window=4, min_substring_tokens=12,
        jaccard_threshold=0.7, max_bucket_size=64,
    )
    ds = ray.data.from_arrow(tbl)
    sigs = signatures(ds, cfg).materialize()
    from raydedup.pipeline import exact_edges

    edges = exact_edges(sigs).union(
        near_edges(sigs, cfg).select_columns(["src", "dst"])
    ).materialize()
    audit = audit_recall(ds, edges, cfg, sample_rate=0.5, seed=3)
    assert audit.truth_pairs_in_sample > 0
    assert audit.recall_lb <= audit.recall_estimate <= audit.recall_ub
    assert audit.recall_estimate >= 0.8


def test_simhash_block_verifier_oversize_bucket_star_fallback():
    """A bucket larger than max_bucket must NOT silently return zero pairs:
    it degrades to a representative star (min id vs others)."""
    from raydedup.simdedup import make_simhash_block_verifier

    n = 5000  # > max_bucket
    ids = np.arange(n, dtype=np.int64)
    sims = np.full(n, 0xDEADBEEF_12345678, dtype=np.uint64)  # all identical
    block = pa.table(
        {
            "chunk_key": pa.array(np.full(n, 7, dtype=np.uint64), pa.uint64()),
            "chunk_idx": pa.array(np.zeros(n, dtype=np.int64)),
            "id": pa.array(ids),
            "simhash": pa.array(sims, pa.uint64()),
        }
    )
    verify = make_simhash_block_verifier(d=3, n_chunks=4, max_bucket=4096)
    out = verify(block)
    # full star over the whole bucket: every member connected to the rep
    assert len(out) == n - 1
    assert (out.column("src").to_numpy() == 0).all()
    assert set(out.column("dst").to_pylist()) == set(range(1, n))
    assert out.column("capped").to_numpy().all()
    assert (out.column("hamming").to_numpy() == 0).all()


def test_simhash_owner_chunk_uniqueness(ray_session):
    """Identical fingerprints agree on every chunk; the owner rule must emit
    each pair exactly once globally (no dedup groupby downstream)."""
    import ray.data

    from raydedup.simdedup import simhash_dup_pairs

    # 6 identical docs -> all 15 pairs, each exactly once
    content = " ".join(f"tok{i}" for i in range(100))
    tbl = pa.table(
        {
            "id": pa.array(np.arange(6, dtype=np.int64)),
            "content": pa.array([content] * 6),
        }
    )
    out = simhash_dup_pairs(ray.data.from_arrow(tbl), CFG, max_hamming=3).to_pandas()
    pairs = list(zip(out["src"], out["dst"]))
    assert len(pairs) == len(set(pairs)) == 15
    assert (out["hamming"] == 0).all()


def test_fdt_sketch_api():
    """FdtSketch (ArrayOfStrings-based, reference API shape) matches exact
    grouped distinct counts in the exact regime and ranks correctly."""
    from raydedup.fdt import FdtSketch

    sk = FdtSketch(lg_k=12)
    # supplier s0 ships 30 parts, s1 ships 10, s2 ships 3 (with dup updates)
    for rep in range(2):
        for p in range(30):
            sk.update(["s0", f"p{p}"])
        for p in range(10):
            sk.update(["s1", f"p{p}"])
        for p in range(3):
            sk.update(["s2", f"p{p}"])
    assert round(sk.estimate()) == 43
    res = sk.get_result([0], limit=2)
    assert res[0] == (("s0",), 30.0)
    assert res[1] == (("s1",), 10.0)
    # merge parity
    a, b = FdtSketch(lg_k=12), FdtSketch(lg_k=12)
    for p in range(20):
        a.update(["x", f"p{p}"])
        b.update(["x", f"q{p}"])
    a.merge(b)
    assert a.get_result([0])[0] == (("x",), 40.0)
