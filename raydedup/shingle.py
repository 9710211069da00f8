"""k-token shingle hashing over per-row token-hash arrays, vectorized.

A w-token shingle's hash is xxHash64 of the w token hashes' little-endian
byte image (one fixed-stride vectorized call — no per-row work). Rows with
fewer than w tokens contribute a single shingle over all their tokens (so a
one-token file still has a signature; the reference's SingleItemSketch
analog, theta/SingleItemSketch.java:43).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from .hashing import xxh64_u64s


def shingle_hashes(
    flat_tokens: np.ndarray, offsets: np.ndarray, k: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compute shingle hashes for every row.

    Returns ``(flat_shingles: uint64[], sh_offsets: int64[n+1])``.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    total = int(offsets[-1])

    # main path: rows with >= k tokens → sliding windows on the flat array
    counts = np.where(lens >= k, lens - k + 1, np.where(lens > 0, 1, 0))
    sh_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    out = np.empty(int(sh_offsets[-1]), dtype=np.uint64)

    if total >= k:
        windows = sliding_window_view(flat_tokens, k)  # (total-k+1, k) view
        # a window starting at s is valid iff s+k <= row_end for s's row
        starts = np.arange(total - k + 1)
        row_of_start = np.searchsorted(offsets, starts, side="right") - 1
        valid = starts + k <= offsets[row_of_start + 1]
        valid_windows = windows[valid]
        if len(valid_windows):
            main_hashes = xxh64_u64s(valid_windows, seed=seed)
            long_rows = lens >= k
            # scatter: rows in order; main shingles fill rows with lens>=k
            dest = np.flatnonzero(long_rows)
            dest_starts = sh_offsets[dest]
            dest_counts = counts[dest]
            idx = np.repeat(dest_starts, dest_counts) + _intra_offsets(dest_counts)
            out[idx] = main_hashes

    # short rows (0 < lens < k): one shingle over all tokens, grouped by length
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        for L in np.unique(lens[short]):
            rows = short[lens[short] == L]
            gather = offsets[rows][:, None] + np.arange(L)
            out[sh_offsets[rows]] = xxh64_u64s(flat_tokens[gather], seed=seed)

    return out, sh_offsets


def _intra_offsets(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for segment-local indices, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(seg_starts, counts)


def segment_unique(
    flat: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row distinct values (sorted), vectorized via one lexsort.

    Returns ``(flat_unique_sorted, new_offsets)``. The per-row result is the
    row's distinct shingle-hash set in ascending order — the engine's
    'compact ordered sketch' form (theta/CompactOperations.java:61-120).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    row_ids = np.repeat(np.arange(n), lens)
    order = np.lexsort((flat, row_ids))
    sf = flat[order]
    sr = row_ids[order]
    if len(sf):
        keep = np.empty(len(sf), dtype=bool)
        keep[0] = True
        keep[1:] = (sf[1:] != sf[:-1]) | (sr[1:] != sr[:-1])
        sf, sr = sf[keep], sr[keep]
    counts = np.bincount(sr, minlength=n)
    new_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return sf, new_offsets
