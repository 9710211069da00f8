"""Suffix-automaton LCS correctness vs brute force."""

from __future__ import annotations

import numpy as np

from raydedup.suffix import _SuffixAutomaton


def brute_lcs(a: np.ndarray, b: np.ndarray) -> int:
    best = 0
    aset = a.tolist()
    bset = b.tolist()
    for i in range(len(aset)):
        for j in range(len(bset)):
            l = 0
            while i + l < len(aset) and j + l < len(bset) and aset[i + l] == bset[j + l]:
                l += 1
            best = max(best, l)
    return best


def test_lcs_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.integers(0, 8, size=rng.integers(1, 60)).astype(np.uint64)
        b = rng.integers(0, 8, size=rng.integers(1, 60)).astype(np.uint64)
        auto = _SuffixAutomaton(a)
        assert auto.lcs_len(b) == brute_lcs(a, b)


def test_lcs_containment():
    rng = np.random.default_rng(1)
    big = rng.integers(0, 1000, size=100).astype(np.uint64)
    small = big[30:70]
    auto = _SuffixAutomaton(big)
    assert auto.lcs_len(small) == 40


def test_lcs_disjoint():
    a = np.arange(50, dtype=np.uint64)
    b = np.arange(100, 150, dtype=np.uint64)
    assert _SuffixAutomaton(a).lcs_len(b) == 0


def brute_find(small: np.ndarray, big: np.ndarray) -> int:
    s, b = small.tolist(), big.tolist()
    for i in range(len(b) - len(s) + 1):
        if b[i : i + len(s)] == s:
            return i
    return -1


def test_find_token_run_random_vs_brute():
    from raydedup.suffix import find_token_run

    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(1, 80))
        big = rng.integers(0, 6, size=n).astype(np.uint64)  # tiny alphabet →
        m = int(rng.integers(1, n + 1))                      # repeats galore
        if rng.random() < 0.5:
            i0 = int(rng.integers(0, n - m + 1))
            small = big[i0 : i0 + m].copy()  # planted: must be found
        else:
            small = rng.integers(0, 6, size=m).astype(np.uint64)
        assert find_token_run(small, big) == brute_find(small, big)


def test_find_token_run_edges():
    from raydedup.suffix import find_token_run

    big = np.arange(10, dtype=np.uint64)
    assert find_token_run(np.empty(0, np.uint64), big) == -1
    assert find_token_run(np.arange(11, dtype=np.uint64), big) == -1  # m > n
    assert find_token_run(big.copy(), big) == 0  # whole-doc match
    assert find_token_run(big[7:].copy(), big) == 7  # suffix match


def test_verifier_fast_path_matches_exact_mode():
    """exact_lcs=False must agree with exact mode on (contained, lcs) for
    contained pairs — the only rows containment_pairs keeps."""
    import pyarrow as pa

    from raydedup.suffix import LcsVerifier

    rng = np.random.default_rng(11)
    words = ["w%d" % i for i in range(400)]
    docs_b, docs_a = [], []
    for i in range(40):
        big = " ".join(rng.choice(words, size=120).tolist())
        toks = big.split()
        if i % 2 == 0:  # contained
            j = int(rng.integers(0, 80))
            small = " ".join(toks[j : j + 40])
        else:  # near miss: one token changed mid-run
            j = int(rng.integers(0, 80))
            run = toks[j : j + 40]
            run[20] = "zzz"
            small = " ".join(run)
        docs_a.append(small)
        docs_b.append(big)
    batch = pa.table(
        {
            "src": pa.array(np.arange(40, dtype=np.int64)),
            "dst": pa.array(np.arange(40, dtype=np.int64) + 1000),
            "content_a": pa.array(docs_a),
            "content_b": pa.array(docs_b),
        }
    )
    exact = LcsVerifier(exact_lcs=True)(batch)
    fast = LcsVerifier(exact_lcs=False)(batch)
    assert exact.column("contained").to_pylist() == fast.column("contained").to_pylist()
    for want, ce, cf, le, lf in zip(
        [i % 2 == 0 for i in range(40)],
        exact.column("contained").to_pylist(),
        fast.column("contained").to_pylist(),
        exact.column("lcs_tokens").to_pylist(),
        fast.column("lcs_tokens").to_pylist(),
    ):
        assert ce == want and cf == want
        if want:
            assert le == lf == 40
        else:
            assert le >= 20 and lf == 0  # exact keeps the diagnostic
