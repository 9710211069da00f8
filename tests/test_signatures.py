"""Shingle / MinHash / SimHash / winnow kernel conformance against the
independent scalar implementations (tests/reference_impls.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import SigConfig
from raydedup.lsh import band_hashes, band_probability, make_band_key
from raydedup.minhash import minhash_jaccard_est, minhash_signatures, perm_constants
from raydedup.shingle import segment_unique, shingle_hashes
from raydedup.simhash import hamming_distance, popcount64, simhash_signatures
from raydedup.tokenize import tokenize_hashes
from raydedup.winnow import winnow_fingerprints
from tests.reference_impls import exact_jaccard, shingle_set

CFG = SigConfig()


def _rows(texts: list[str], k: int = 5, seed: int = 9001):
    arr = pa.array(texts, type=pa.string())
    flat, off = tokenize_hashes(arr, seed=seed)
    return shingle_hashes(flat, off, k, seed)


def test_shingles_match_reference_impl():
    texts = [
        "a b c d e f g h i j",
        "one two three",
        "",
        "x " * 50,
        "token",
    ]
    sh, off = _rows(texts)
    for i, t in enumerate(texts):
        got = set(int(x) for x in np.unique(sh[off[i] : off[i + 1]]))
        want = shingle_set(t.split(), 5, 9001)
        assert got == want, f"row {i}"


def test_segment_unique_sorted_distinct():
    flat = np.array([5, 3, 3, 9, 1, 1, 1], dtype=np.uint64)
    offsets = np.array([0, 4, 7])
    u, uo = segment_unique(flat, offsets)
    assert u[uo[0] : uo[1]].tolist() == [3, 5, 9]
    assert u[uo[1] : uo[2]].tolist() == [1]


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    vocab = [f"tok{i}" for i in range(200)]
    base = [vocab[i] for i in rng.integers(0, 200, 300)]
    # mutate 10% of tokens
    mut = list(base)
    for i in rng.choice(300, 30, replace=False):
        mut[i] = vocab[(i * 7) % 200]
    t0, t1 = " ".join(base), " ".join(mut)
    sh, off = _rows([t0, t1])
    sig = minhash_signatures(sh, off, 128, 9001)
    est = minhash_jaccard_est(sig[0], sig[1])
    true = exact_jaccard(shingle_set(base, 5, 9001), shingle_set(mut, 5, 9001))
    assert abs(est - true) < 4 * np.sqrt(true * (1 - true) / 128) + 0.02


def test_minhash_identical_and_empty():
    sh, off = _rows(["a b c d e f", "a b c d e f", ""])
    sig = minhash_signatures(sh, off, 128, 9001)
    assert minhash_jaccard_est(sig[0], sig[1]) == 1.0
    assert (sig[2] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_perm_constants_deterministic_and_odd():
    a, b = perm_constants(128, 9001)
    a2, b2 = perm_constants(128, 9001)
    assert np.array_equal(a, a2) and np.array_equal(b, b2)
    assert (a % np.uint64(2) == 1).all()


def test_simhash_properties():
    sh, off = _rows(["a b c d e f g h", "a b c d e f g h", "q r s t u v w x"])
    s = simhash_signatures(sh, off)
    assert hamming_distance(s[0], s[1])[0] == 0
    assert hamming_distance(s[0], s[2])[0] > 10


def test_popcount():
    vals = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert popcount64(vals).tolist() == [0, 1, 2, 64, 1]


def test_band_probability_curve():
    # b=16, r=8 S-curve checkpoints
    assert band_probability(1.0, 16, 8) == 1.0
    assert band_probability(0.95, 16, 8) > 0.999
    assert band_probability(0.3, 16, 8) < 0.002


def test_band_hashes_collide_iff_band_equal():
    rng = np.random.default_rng(1)
    sig = rng.integers(0, 2**63, size=(2, 128), dtype=np.uint64)
    sig[1, :8] = sig[0, :8]  # band 0 equal
    bh = band_hashes(sig, 16, 8, 9001)
    assert bh[0, 0] == bh[1, 0]
    assert (bh[0, 1:] != bh[1, 1:]).all()
    k0 = make_band_key(np.array([0], dtype=np.uint64), bh[0:1, 0])
    k1 = make_band_key(np.array([1], dtype=np.uint64), bh[0:1, 0])
    assert k0 != k1  # band index is part of the key


def test_winnow_guarantee_shared_block():
    # two docs sharing a verbatim run of >= t = k + w - 1 tokens must share
    # at least one fingerprint (winnowing guarantee)
    k, w = 8, 4
    t = k + w - 1
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(1000)]
    block = [vocab[i] for i in rng.integers(0, 1000, t)]
    doc_a = [vocab[i] for i in rng.integers(0, 1000, 40)] + block
    doc_b = block + [vocab[i] for i in rng.integers(0, 1000, 40)]
    arr = pa.array([" ".join(doc_a), " ".join(doc_b)])
    flat, off = tokenize_hashes(arr, seed=1)
    fp, pos, fo = winnow_fingerprints(flat, off, k, w, 1)
    a = set(fp[fo[0] : fo[1]].tolist())
    b = set(fp[fo[1] : fo[2]].tolist())
    assert a & b, "winnow guarantee violated"


def test_winnow_disjoint_docs_share_nothing():
    arr = pa.array(["a b c d e f g h i j k l", "z y x w v u t s r q p o"])
    flat, off = tokenize_hashes(arr, seed=1)
    fp, pos, fo = winnow_fingerprints(flat, off, 4, 3, 1)
    a = set(fp[fo[0] : fo[1]].tolist())
    b = set(fp[fo[1] : fo[2]].tolist())
    assert not (a & b)


def test_short_rows_zero_fingerprints():
    arr = pa.array(["a b", ""])
    flat, off = tokenize_hashes(arr, seed=1)
    fp, pos, fo = winnow_fingerprints(flat, off, 8, 4, 1)
    assert fo[-1] == 0
