"""LSH banding auto-tuner: pick (bands b, rows-per-band r) for a MinHash
signature of ``num_perm`` permutations so the S-curve
``P(collide | J = s) = 1 - (1 - s^r)^b`` best separates pairs around a
target Jaccard threshold.

The quality measure is the classic one (Mining of Massive Datasets §3.4,
also what the public datasketch library optimizes): the false-positive
area ∫₀ᵗ P(s) ds (sub-threshold pairs that still collide somewhere) and
the false-negative area ∫ₜ¹ (1 − P(s)) ds (above-threshold pairs every
band misses), combined with user weights. Candidate configs are every
(b, r) with b·r ≤ num_perm, r ≥ 1 — using fewer than num_perm rows is
allowed (the unused permutations are simply not banded), matching how a
library user would shrink banding cost without recomputing signatures.

Everything is a pure scalar computation on the driver (numpy over a fixed
integration grid) — there is nothing distributed to get wrong; the value
is choosing the config BEFORE a 100 TB banding pass, where a mis-set r
either floods the bucket shuffle with sub-threshold candidate pairs (r
too small) or silently drops true near-dups (r too large).

The flagship's frozen default (b=16, r=8 at num_perm=128,
``SigConfig``) is the north-star-pinned config; this module is the
auditable justification knob for users running other thresholds.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BandConfig(NamedTuple):
    bands: int
    rows_per_band: int
    fp_area: float
    fn_area: float
    score: float


def collision_probability(s, bands: int, rows_per_band: int):
    """P(candidate | Jaccard = s) = 1 - (1 - s^r)^b, elementwise."""
    s = np.asarray(s, dtype=np.float64)
    if bands < 1 or rows_per_band < 1:
        raise ValueError("bands and rows_per_band must be >= 1")
    return 1.0 - (1.0 - s**rows_per_band) ** bands


def threshold_at_half(bands: int, rows_per_band: int) -> float:
    """The S-curve midpoint rule of thumb (1/b)^(1/r): the Jaccard where a
    pair has ~50% (actually 1-(1-1/b)^b ≈ 63%) collision odds — the value
    quoted as the config's 'threshold' in the MMDS treatment."""
    return float((1.0 / bands) ** (1.0 / rows_per_band))


def band_error_areas(
    bands: int, rows_per_band: int, threshold: float, resolution: int = 2000
) -> tuple[float, float]:
    """(false-positive area, false-negative area) of the S-curve around
    ``threshold``, by midpoint-rule integration on a uniform grid (the
    integrand is smooth and bounded, so midpoint at resolution=2000 is
    accurate to ~1e-7 — far below the gaps between candidate configs)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    lo = np.linspace(0.0, threshold, resolution, endpoint=False)
    lo_mid = lo + threshold / resolution / 2.0
    fp = float(collision_probability(lo_mid, bands, rows_per_band).mean() * threshold)
    width = 1.0 - threshold
    hi = np.linspace(threshold, 1.0, resolution, endpoint=False)
    hi_mid = hi + width / resolution / 2.0
    fn = float(
        (1.0 - collision_probability(hi_mid, bands, rows_per_band)).mean() * width
    )
    return fp, fn


def optimal_band_config(
    num_perm: int,
    threshold: float,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
    resolution: int = 2000,
) -> BandConfig:
    """The (b, r) with b·r ≤ num_perm minimizing
    ``fp_weight·FP_area + fn_weight·FN_area``; ties break to the config
    using fewer total rows (cheaper banding), then to larger r (fewer
    emitted band keys per doc). Raise ``fp_weight`` when the bucket
    shuffle / verify stage is the bottleneck, ``fn_weight`` when recall
    is contractual (the flagship's ≥0.99 recall bar)."""
    if num_perm < 1:
        raise ValueError("num_perm must be >= 1")
    if fp_weight < 0 or fn_weight < 0 or fp_weight + fn_weight == 0:
        raise ValueError("weights must be non-negative and not both zero")
    best: BandConfig | None = None
    for r in range(1, num_perm + 1):
        b_max = num_perm // r
        for b in range(1, b_max + 1):
            fp, fn = band_error_areas(b, r, threshold, resolution)
            score = fp_weight * fp + fn_weight * fn
            cand = BandConfig(b, r, fp, fn, score)
            if (
                best is None
                or score < best.score - 1e-15
                or (
                    abs(score - best.score) <= 1e-15
                    and (
                        b * r < best.bands * best.rows_per_band
                        or (
                            b * r == best.bands * best.rows_per_band
                            and r > best.rows_per_band
                        )
                    )
                )
            ):
                best = cand
    assert best is not None
    return best
