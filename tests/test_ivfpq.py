"""IVF-PQ (raydedup/ivfpq.py) vs scalar references, persisted-index
protocol, pruned reads, and residual-ADC retrieval quality."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydedup.cluster import _assign, _sq_dists
from raydedup.embed import quantize
from raydedup.ivfpq import (
    ann_topk_ivfpq_indexed,
    ivfpq_adc_topk,
    ivfpq_encode,
    ivfpq_train,
    probe_lists,
    read_ivfpq_model,
    residual_view,
    write_ivfpq_index,
)

SF_DIR = "/root/testdata/sf0.001"


def _fixture(n=300, dim=16, n_blobs=6, seed=19):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, dim)) * 0.3
    vecs = centers[np.arange(n) % n_blobs] + rng.normal(size=(n, dim)) * 0.03
    return np.clip(vecs, -0.99, 0.99).astype(np.float32)


def _ds(ray, vecs, blocks=7):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs.astype(float))),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _scalar_encode(vecs, coarse, books):
    """Pure-numpy replay of ivfpq_encode (assign → residual → per-subspace
    argmin, ties to the lowest index everywhere)."""
    qm = quantize(vecs.astype(np.float64))
    a = _assign(qm, coarse)
    res = qm - coarse[a]
    m, _, dsub = books.shape
    codes = np.empty((len(qm), m), dtype=np.int64)
    for j in range(m):
        codes[:, j] = _assign(res[:, j * dsub : (j + 1) * dsub], books[j])
    return a, codes


def _scalar_adc(qq, coarse, books, lists, codes, vids, nprobe, k):
    """Brute-force residual-ADC reference: for each query, score every row
    in its nprobe probed lists from the LUT-reconstructed distance."""
    m, _, dsub = books.shape
    probed = probe_lists(qq, coarse, nprobe)
    out = []
    for qi in range(len(qq)):
        mask = np.isin(lists, probed[qi])
        v = vids[mask]
        qr = qq[qi] - coarse[lists[mask]]
        d = np.zeros(mask.sum(), dtype=np.float64)
        for j in range(m):
            sub = qr[:, j * dsub : (j + 1) * dsub]
            c = books[j][codes[mask, j]]
            d += ((sub - c) ** 2).sum(axis=1)
        cut = np.lexsort((v, d))[:k]
        out.append((v[cut], d[cut]))
    return out


def test_residual_view_roundtrips_exact_integers(ray_session):
    """The /2^20 float round-trip is lossless: re-quantizing the residual
    view recovers the bit-exact integer residual (the contract the PQ
    training chain and the SQL oracle both rely on)."""
    from raydedup.cluster import kmeans_fit, quantized_matrix

    vecs = _fixture(n=120, dim=8)
    ds = _ds(ray_session, vecs)
    coarse = kmeans_fit(ds, k=3, n_iter=2)
    res = residual_view(ds, coarse).to_pandas().sort_values("vec_id")
    got = quantize(np.stack(res["embedding"].to_numpy()))
    qm = quantize(vecs.astype(np.float64))
    want = qm - coarse[_assign(qm, coarse)]
    assert np.array_equal(got, want)
    # and the engine's list assignment matches
    assert np.array_equal(res["list_id"].to_numpy(), _assign(qm, coarse))


def test_encode_matches_scalar_reference_and_blocks(ray_session):
    vecs = _fixture(n=200, dim=8, n_blobs=4)
    ds = _ds(ray_session, vecs, blocks=5)
    coarse, books = ivfpq_train(ds, n_lists=3, m=2, k_codes=4, n_iter_coarse=2, n_iter_pq=2)
    assert books.shape == (2, 4, 4)
    want_a, want_c = _scalar_encode(vecs, coarse, books)
    for blocks in (1, 5, 11):
        enc = (
            ivfpq_encode(_ds(ray_session, vecs, blocks=blocks), coarse, books)
            .to_pandas()
            .sort_values("vec_id")
        )
        assert np.array_equal(enc["list_id"].to_numpy(), want_a), blocks
        assert np.array_equal(np.stack(enc["codes"].to_numpy()), want_c), blocks


def test_pq_books_trained_on_residuals(ray_session):
    """The codebooks come from pq_train over the residual view — not the
    raw vectors (the property that makes IVF-PQ beat flat PQ)."""
    from raydedup.pq import pq_train

    vecs = _fixture(n=150, dim=8)
    ds = _ds(ray_session, vecs)
    coarse, books = ivfpq_train(ds, n_lists=2, m=2, k_codes=4, n_iter_coarse=1, n_iter_pq=2)
    want = pq_train(residual_view(ds, coarse), m=2, k_codes=4, n_iter=2, dim=8)
    assert np.array_equal(books, want)


def test_adc_topk_matches_scalar_reference(ray_session):
    vecs = _fixture(n=250, dim=16, n_blobs=5, seed=3)
    ds = _ds(ray_session, vecs, blocks=6)
    coarse, books = ivfpq_train(ds, n_lists=4, m=4, k_codes=8, n_iter_coarse=2, n_iter_pq=2)
    enc = ivfpq_encode(ds, coarse, books).materialize()
    qq = quantize(vecs[:4].astype(np.float64))
    lists, codes = _scalar_encode(vecs, coarse, books)
    for nprobe in (1, 2, 4):
        got = ivfpq_adc_topk(
            enc, coarse, books, vecs[:4].astype(np.float64),
            np.arange(4), k=7, nprobe=nprobe,
        ).to_pandas()
        want = _scalar_adc(qq, coarse, books, lists, codes,
                           np.arange(len(vecs)), nprobe, k=7)
        for qi in range(4):
            mine = got[got["query_id"] == qi]
            assert np.array_equal(mine["vec_id"].to_numpy(), want[qi][0]), (nprobe, qi)
            assert np.array_equal(mine["adc_dist"].to_numpy(), want[qi][1]), (nprobe, qi)


def test_recall_monotone_in_nprobe(ray_session):
    """More probes can only widen each query's candidate set, so recall of
    the full-probe ADC ranking is weakly monotone in nprobe — and at
    nprobe == n_lists hits land in the query's own blob."""
    vecs = _fixture(n=400, dim=16, n_blobs=8, seed=5)
    ds = _ds(ray_session, vecs)
    coarse, books = ivfpq_train(ds, n_lists=8, m=8, k_codes=16,
                                n_iter_coarse=3, n_iter_pq=3)
    enc = ivfpq_encode(ds, coarse, books).materialize()
    q = vecs[:5].astype(np.float64)
    full = ivfpq_adc_topk(enc, coarse, books, q, np.arange(5), k=10, nprobe=8).to_pandas()
    blobs = np.arange(400) % 8
    prev = -1.0
    for nprobe in (1, 2, 4, 8):
        out = ivfpq_adc_topk(enc, coarse, books, q, np.arange(5), k=10,
                             nprobe=nprobe).to_pandas()
        rec = np.mean([
            len(set(out[out["query_id"] == qi]["vec_id"])
                & set(full[full["query_id"] == qi]["vec_id"])) / 10
            for qi in range(5)
        ])
        assert rec >= prev - 1e-12, nprobe
        prev = rec
    assert prev == 1.0  # full probe recalls itself
    for qi in range(5):
        hits = full[full["query_id"] == qi]["vec_id"].to_numpy()
        assert len(hits) == 10
        assert (blobs[hits] == blobs[qi]).mean() >= 0.9, qi


def test_indexed_parity_and_pruned_reads(ray_session, tmp_path):
    import ray.data

    idx = str(tmp_path / "ivfpq")
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    meta = write_ivfpq_index(ds, idx, n_lists=8, m=4, k_codes=16,
                             n_iter_coarse=2, n_iter_pq=2)
    assert meta["n_lists"] == 8 and meta["m"] == 4
    n_files = len(os.listdir(os.path.join(idx, "lists")))
    assert n_files >= 2

    # codes persist as uint8: m bytes per vector, the 100 TB claim
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(idx, "lists", sorted(os.listdir(os.path.join(idx, "lists")))[0])
    )
    assert part.schema.field("codes").type == pa.list_(pa.uint8())
    assert part.column_names == ["vec_id", "codes"]

    first = ds.filter(expr="vec_id < 4").to_pandas().sort_values("vec_id")
    queries = np.stack(first["embedding"].to_numpy()).astype(np.float64)
    qids = first["vec_id"].to_numpy()

    # full probe: bit-identical to ADC over the full encoded corpus
    coarse, books = read_ivfpq_model(idx)
    enc = ivfpq_encode(ds, coarse, books)
    want = ivfpq_adc_topk(enc, coarse, books, queries, qids, k=10,
                          nprobe=8).to_pandas()
    got = ann_topk_ivfpq_indexed(idx, queries, qids, k=10, nprobe=8).to_pandas()
    key = ["query_id", "vec_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )

    # pruned probe: strictly fewer list files are read
    probed = np.unique(probe_lists(quantize(queries), coarse, 1))
    assert len(probed) < n_files
    part_out = ann_topk_ivfpq_indexed(idx, queries, qids, k=10, nprobe=1).to_pandas()
    for q in qids:
        mine = part_out[part_out["query_id"] == q]
        assert len(mine) == 10
        # the query is a corpus member: its own code distance is minimal
        assert mine.iloc[0]["vec_id"] == q or mine["adc_dist"].min() <= 1e-9


def test_index_sample_training_path(ray_session, tmp_path):
    """train_ds trains the quantizers on a sample while the FULL corpus is
    encoded — model equals ivfpq_train(sample), lists cover every row."""
    import ray.data

    vecs = _fixture(n=240, dim=8, n_blobs=4, seed=11)
    full = _ds(ray_session, vecs, blocks=6)
    sample = _ds(ray_session, vecs[:80], blocks=2)
    idx = str(tmp_path / "ivfpq_s")
    meta = write_ivfpq_index(
        full, idx, n_lists=3, m=2, k_codes=4,
        n_iter_coarse=1, n_iter_pq=1, train_ds=sample,
    )
    assert meta["rows"] == 240
    coarse, books = read_ivfpq_model(idx)
    want_c, want_b = ivfpq_train(
        sample, n_lists=3, m=2, k_codes=4, n_iter_coarse=1, n_iter_pq=1
    )
    assert np.array_equal(coarse, want_c)
    assert np.array_equal(books, want_b)


def test_index_write_protocol(ray_session, tmp_path):
    import ray.data

    idx = str(tmp_path / "ivfpq")
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    write_ivfpq_index(ds, idx, n_lists=4, m=2, k_codes=8,
                      n_iter_coarse=1, n_iter_pq=1)
    with pytest.raises(FileExistsError):
        write_ivfpq_index(ds, idx, n_lists=4, m=2, k_codes=8)
    # crash-resume: wiping meta.json leaves a partial build that must REUSE
    # the persisted model rather than retraining
    coarse1, books1 = read_ivfpq_model(idx)
    os.remove(os.path.join(idx, "meta.json"))
    write_ivfpq_index(ds, idx, n_lists=4, m=2, k_codes=8,
                      n_iter_coarse=1, n_iter_pq=1)
    coarse2, books2 = read_ivfpq_model(idx)
    assert np.array_equal(coarse1, coarse2)
    assert np.array_equal(books1, books2)
    # explicit rebuild
    meta = write_ivfpq_index(ds, idx, n_lists=2, m=2, k_codes=4,
                             n_iter_coarse=1, n_iter_pq=1, overwrite=True)
    assert meta["n_lists"] == 2


def test_partial_resume_rejects_changed_params(ray_session, tmp_path):
    """A crashed partial build must not silently serve a model trained
    under DIFFERENT hyperparameters; overwrite=True clears partials too."""
    import ray.data

    idx = str(tmp_path / "ivfpq")
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    write_ivfpq_index(ds, idx, n_lists=4, m=2, k_codes=8,
                      n_iter_coarse=1, n_iter_pq=1)
    os.remove(os.path.join(idx, "meta.json"))  # simulate mid-encode crash
    with pytest.raises(ValueError, match="does not match"):
        write_ivfpq_index(ds, idx, n_lists=8, m=2, k_codes=8,
                          n_iter_coarse=1, n_iter_pq=1)
    meta = write_ivfpq_index(ds, idx, n_lists=8, m=4, k_codes=8,
                             n_iter_coarse=1, n_iter_pq=1, overwrite=True)
    assert meta["n_lists"] == 8 and meta["m"] == 4


def test_list_id_parse_full_digit_run():
    from raydedup.ivfpq import _list_id_from_path

    assert _list_id_from_path("/x/lists/part-00042.parquet") == 42
    # 05d is a minimum width: 6-digit ids must parse whole, not truncate
    assert _list_id_from_path("/x/lists/part-123456.parquet") == 123456
