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
