"""Bound math for sketch estimates (numpy/scalar).

Implements the public statistical formulas the reference relies on:

* Binomial-proportion bounds via Abramowitz & Stegun formula 26.5.22
  (common/BoundsOnBinomialProportions.java:106-270) — used for Jaccard
  ratio bounds (common/BoundsOnRatiosInSampledSets.java:52-121, incl. the
  fixed 2-std-dev interval and the sqrt(1-f) adjuster).
* Normal-approximation bounds on a Bernoulli-sampled distinct count
  (the role of thetacommon/BinomialBoundsN.java:234-257; we use the standard
  normal approximation with the same RSE contract: RSE ≈ 1/sqrt(k)).
"""

from __future__ import annotations

import math


def erf(x: float) -> float:
    return math.erf(x)


def normal_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _delta_of_num_stdevs(kappa: float) -> float:
    return normal_cdf(-1.0 * kappa)


def _abramowitz_stegun_26_5_22(a: float, b: float, yp: float) -> float:
    """Approximate inverse of the incomplete beta — A&S formula 26.5.22."""
    b2m1 = 2.0 * b - 1.0
    a2m1 = 2.0 * a - 1.0
    lam = (yp * yp - 3.0) / 6.0
    h = 2.0 / (1.0 / a2m1 + 1.0 / b2m1)
    term1 = (yp * math.sqrt(h + lam)) / h
    term2 = (1.0 / b2m1) - (1.0 / a2m1)
    term3 = (lam + 5.0 / 6.0) - (2.0 / (3.0 * h))
    w = term1 - term2 * term3
    return a / (a + b * math.exp(2.0 * w))


def approx_lower_bound_on_p(n: int, k: int, num_std_devs: float) -> float:
    if n == 0 or k == 0:
        return 0.0
    if k == 1:
        return 1.0 - (1.0 - _delta_of_num_stdevs(num_std_devs)) ** (1.0 / n)
    if k == n:
        return _delta_of_num_stdevs(num_std_devs) ** (1.0 / n)
    x = _abramowitz_stegun_26_5_22((n - k) + 1, k, -1.0 * num_std_devs)
    return 1.0 - x


def approx_upper_bound_on_p(n: int, k: int, num_std_devs: float) -> float:
    if n == 0 or k == n:
        return 1.0
    if k == n - 1:
        return (1.0 - _delta_of_num_stdevs(num_std_devs)) ** (1.0 / n)
    if k == 0:
        return 1.0 - _delta_of_num_stdevs(num_std_devs) ** (1.0 / n)
    x = _abramowitz_stegun_26_5_22(n - k, k + 1, num_std_devs)
    return 1.0 - x


_NUM_STD_DEVS = 2.0  # fixed 95% interval (BoundsOnRatiosInSampledSets.java:40)


def _hacky_adjuster(f: float) -> float:
    """sqrt(1-f) interval-width adjuster (BoundsOnRatiosInSampledSets.java:110-118)."""
    tmp = math.sqrt(1.0 - f)
    return tmp if f <= 0.5 else tmp + 0.01 * (f - 0.5)


def ratio_bounds_lb(a: int, b: int, f: float) -> float:
    """Lower bound on |B|/|A| from a Bernoulli(f) sample of A with b hits."""
    if a == 0:
        return 0.0
    if f >= 1.0:
        return b / a
    return approx_lower_bound_on_p(a, b, _NUM_STD_DEVS * _hacky_adjuster(f))


def ratio_bounds_ub(a: int, b: int, f: float) -> float:
    if a == 0:
        return 1.0
    if f >= 1.0:
        return b / a
    return approx_upper_bound_on_p(a, b, _NUM_STD_DEVS * _hacky_adjuster(f))


def binomial_bounds_lb(num_samples: int, theta: float, num_std_dev: int = 2) -> float:
    """Lower bound on true distinct count N given num_samples retained at
    sampling rate theta (normal approximation; exact when theta == 1)."""
    if theta >= 1.0:
        return float(num_samples)
    if num_samples == 0:
        return 0.0
    est = num_samples / theta
    rel = num_std_dev * math.sqrt(1.0 - theta) / math.sqrt(num_samples)
    return max(float(num_samples), est / (1.0 + rel))


def binomial_bounds_ub(num_samples: int, theta: float, num_std_dev: int = 2) -> float:
    if theta >= 1.0:
        return float(num_samples)
    if num_samples == 0:
        # nothing retained: UB driven by P(no sample) = (1-theta)^N
        delta = _delta_of_num_stdevs(num_std_dev)
        return math.log(delta) / math.log(1.0 - theta) if theta < 1.0 else 0.0
    est = num_samples / theta
    rel = num_std_dev * math.sqrt(1.0 - theta) / math.sqrt(num_samples)
    return est * (1.0 + rel)


def theta_rse(k: int) -> float:
    """Theta sketch RSE ≈ 1/sqrt(k) (thetacommon/ThetaUtil.java:50-57:
    k=4096 → ±1.56% at 68% confidence)."""
    return 1.0 / math.sqrt(k)
