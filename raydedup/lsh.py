"""LSH banding over MinHash signatures (b=16 bands × r=8 rows), vectorized.

band_hash(i) = xxh64 of the i-th band's r signature words, seeded by the
band index — two documents collide in band i iff their r components match.
Collision probability at Jaccard j is 1-(1-j^r)^b (the standard S-curve;
with b=16, r=8: j=0.85 → ~0.96, j=0.6 → ~0.26).

Skew handling (SURVEY §4; precedent: hllmap tiered promotion,
hllmap/UniqueCountMap.java:24-48): band keys estimated above
``max_bucket_size`` by the heavy-hitter pre-pass are salted into n_salt
sub-buckets keyed by a hash of the doc id (stages.BandEmitStage._salt);
a delegate round (min-id per sub-bucket regrouping under the original
key) restores connectivity across sub-buckets. Buckets that still exceed
``max_bucket_size`` (pre-pass misses) degrade to
cluster-via-representative (every member pairs with the bucket minimum
only — linear, not quadratic).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64, xxh64_u64s

U64 = np.uint64


def band_probability(j: float, bands: int, rows: int) -> float:
    """P(candidate) for a pair at true Jaccard j — the LSH S-curve."""
    return 1.0 - (1.0 - j**rows) ** bands


def band_hashes(sig: np.ndarray, bands: int, rows: int, seed: int) -> np.ndarray:
    """(n, bands) uint64 band hashes from an (n, bands*rows) signature matrix."""
    sig = np.ascontiguousarray(sig, dtype=np.uint64)
    n, p = sig.shape
    if p != bands * rows:
        raise ValueError(f"signature width {p} != bands*rows {bands*rows}")
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        out[:, b] = xxh64_u64s(sig[:, b * rows : (b + 1) * rows], seed=seed + b + 1)
    return out


def make_band_key(band_idx: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """Single uint64 shuffle key combining band index and band hash."""
    return splitmix64(band_hash + U64(0x100000001) * band_idx.astype(np.uint64))
