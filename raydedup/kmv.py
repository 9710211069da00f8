"""KMV / Theta sketch algebra: bottom-k signatures with mergeable set ops.

Semantics mirror the reference's theta family:

* A sketch is ``(theta: uint64, hashes: sorted uint64[] all < theta)`` —
  exactly the compact-ordered form (theta/Sketch.java:344-352). ``theta``
  starts at 2^63 (MAX_THETA); after trimming to k retained values theta is
  the (k+1)-th smallest hash (quickSelectAndRebuild pivot k+1,
  theta/HeapQuickSelectSketch.java:300-312).
* estimate = count * 2^63 / theta  (theta/Sketch.java:627-629).
* Union: min-theta rule + re-trim to k (theta/UnionImpl.java:300-357).
* Intersection: min-theta, hashes present in both (IntersectionImpl.java:229-303).
* AnotB: hashes of A below min-theta not present in B (AnotBimpl.java:65-146).
* Jaccard {LB, est, UB}: union + intersection ratio with bounds
  (theta/JaccardSimilarity.java:55-96), similarityTest uses LB >= threshold
  (JaccardSimilarity.java:148-155).

Hash domain: uniform uint64 in (0, 2^63); 0 is an illegal sentinel
(thetacommon/HashOperations.java:305-321). Our shingle pipeline feeds xxh64
values masked into this domain (``h >> 1``); the theta-parity path feeds
murmur3(seed=9001)[0] >> 1.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bounds import binomial_bounds_lb, binomial_bounds_ub, ratio_bounds_lb, ratio_bounds_ub
from .config import SketchesArgumentError

MAX_THETA = np.uint64(1) << np.uint64(63)  # 2^63, theta of an exact-mode sketch


def to_theta_domain(hashes64: np.ndarray) -> np.ndarray:
    """Map raw 64-bit hashes into (0, 2^63): drop sign bit, drop 0 sentinels.

    Mirrors ``hash(...)[0] >>> 1`` (theta/UpdateSketch.java:222) and the
    hash==0 rejection (thetacommon/HashOperations.java:305-321).
    """
    h = np.asarray(hashes64, dtype=np.uint64) >> np.uint64(1)
    return h[h != np.uint64(0)]


@dataclass
class KmvSketch:
    """Compact ordered theta/KMV sketch."""

    theta: np.uint64
    hashes: np.ndarray  # sorted uint64, all < theta, distinct
    k: int

    @property
    def is_estimation_mode(self) -> bool:
        return self.theta < MAX_THETA

    def estimate(self) -> float:
        if self.theta == MAX_THETA:
            return float(len(self.hashes))
        return len(self.hashes) * (float(MAX_THETA) / float(self.theta))

    def lower_bound(self, num_std_dev: int = 2) -> float:
        return binomial_bounds_lb(len(self.hashes), float(self.theta) / float(MAX_THETA), num_std_dev)

    def upper_bound(self, num_std_dev: int = 2) -> float:
        return binomial_bounds_ub(len(self.hashes), float(self.theta) / float(MAX_THETA), num_std_dev)

    def serialize(self) -> bytes:
        """(k:int32, theta:uint64, hashes little-endian) — Parquet binary cell."""
        head = np.array([self.k], dtype=np.int32).tobytes() + np.array(
            [self.theta], dtype=np.uint64
        ).tobytes()
        return head + np.ascontiguousarray(self.hashes, dtype="<u8").tobytes()

    @staticmethod
    def deserialize(buf: bytes) -> "KmvSketch":
        k = int(np.frombuffer(buf[:4], dtype=np.int32)[0])
        theta = np.frombuffer(buf[4:12], dtype=np.uint64)[0]
        hashes = np.frombuffer(buf[12:], dtype="<u8").astype(np.uint64)
        return KmvSketch(theta=theta, hashes=hashes, k=k)


def empty_sketch(k: int) -> KmvSketch:
    return KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=k)


def build_sketch(theta_hashes: np.ndarray, k: int, p: float = 1.0) -> KmvSketch:
    """Build a compact KMV sketch from hashes already in (0, 2^63).

    ``p`` is the reference's up-front sampling probability
    (UpdateSketchBuilder.setP, theta/UpdateSketch.java:77-86): theta starts
    at p*2^63 and hashes at/above it are rejected before any trimming, so
    the sketch behaves as if fed a p-sample of the stream while estimates
    remain unbiased (count / theta)."""
    if not 0.0 < p <= 1.0:
        raise SketchesArgumentError(f"p must be in (0, 1]: {p}")
    u = np.unique(np.asarray(theta_hashes, dtype=np.uint64))
    u = u[u != np.uint64(0)]
    theta0 = MAX_THETA if p == 1.0 else np.uint64(int(p * float(MAX_THETA)))
    if p != 1.0:
        u = u[u < theta0]
    if len(u) <= k:
        return KmvSketch(theta=theta0, hashes=u, k=k)
    # theta = (k+1)-th smallest (QuickSelect pivot k+1,
    # HeapQuickSelectSketch.java:300-312); retain the k below it
    return KmvSketch(theta=u[k], hashes=u[:k], k=k)


def trim_to_k(theta: np.uint64, hashes: np.ndarray, k: int) -> KmvSketch:
    """Pull a merged hash set back to k minimum values (UnionImpl.java:234-261)."""
    if len(hashes) <= k:
        return KmvSketch(theta=theta, hashes=hashes, k=k)
    return KmvSketch(theta=min(theta, hashes[k]), hashes=hashes[:k], k=k)


def union(a: KmvSketch, b: KmvSketch, k: int | None = None) -> KmvSketch:
    """Theta union: min-theta rule, merge retained hashes below it, trim to k."""
    k = k or max(a.k, b.k)
    theta = min(a.theta, b.theta)
    merged = np.union1d(a.hashes, b.hashes)
    merged = merged[merged < theta]
    return trim_to_k(np.uint64(theta), merged, k)


def union_many(sketches: list[KmvSketch], k: int | None = None) -> KmvSketch:
    if not sketches:
        return empty_sketch(k or 0)
    k = k or max(s.k for s in sketches)
    theta = np.uint64(min(s.theta for s in sketches))
    merged = np.unique(np.concatenate([s.hashes for s in sketches]))
    merged = merged[merged < theta]
    return trim_to_k(theta, merged, k)


def intersection(a: KmvSketch, b: KmvSketch) -> KmvSketch:
    """Theta intersection: min-theta, hashes in both (IntersectionImpl.java:229-337)."""
    theta = np.uint64(min(a.theta, b.theta))
    common = np.intersect1d(a.hashes, b.hashes, assume_unique=True)
    common = common[common < theta]
    return KmvSketch(theta=theta, hashes=common, k=max(a.k, b.k))


def a_not_b(a: KmvSketch, b: KmvSketch) -> KmvSketch:
    """Theta A-not-B: A's hashes below min-theta absent from B (AnotBimpl.java:65-146)."""
    theta = np.uint64(min(a.theta, b.theta))
    diff = np.setdiff1d(a.hashes, b.hashes, assume_unique=True)
    diff = diff[diff < theta]
    return KmvSketch(theta=theta, hashes=diff, k=a.k)


def jaccard(a: KmvSketch, b: KmvSketch) -> tuple[float, float, float]:
    """{LB, estimate, UB} of J(A,B) at 95.4% confidence.

    Follows theta/JaccardSimilarity.java:55-96: J = |A∩B| / |A∪B| computed on
    the *unioned* sketch's sample, with ratio bounds from
    BoundsOnRatiosInThetaSketchedSets.java:59-96.
    """
    # corner cases (JaccardSimilarity.java:55-60): both empty -> ONES (two
    # empty sets are identical), exactly one empty -> ZEROS
    a_empty = len(a.hashes) == 0 and a.theta == MAX_THETA
    b_empty = len(b.hashes) == 0 and b.theta == MAX_THETA
    if a_empty and b_empty:
        return (1.0, 1.0, 1.0)
    if a_empty or b_empty:
        return (0.0, 0.0, 0.0)
    # exact-set short-circuit (JaccardSimilarity.java:106-133 exactlyEqual)
    if (
        a.theta == MAX_THETA
        and b.theta == MAX_THETA
        and len(a.hashes) == len(b.hashes)
        and np.array_equal(a.hashes, b.hashes)
    ):
        return (1.0, 1.0, 1.0)
    k = max(a.k, b.k)
    u = union(a, b, k=k)
    # count of union sample present in both A and B
    in_a = np.isin(u.hashes, a.hashes, assume_unique=True)
    in_b = np.isin(u.hashes, b.hashes, assume_unique=True)
    inter = int(np.count_nonzero(in_a & in_b))
    n_union = len(u.hashes)
    if n_union == 0:
        return (0.0, 0.0, 0.0)
    theta_frac = float(u.theta) / float(MAX_THETA)
    est = inter / n_union
    lb = ratio_bounds_lb(n_union, inter, theta_frac)
    ub = ratio_bounds_ub(n_union, inter, theta_frac)
    return (lb, est, ub)


def similarity_test(a: KmvSketch, b: KmvSketch, threshold: float) -> bool:
    """One-sided test: J(A,B) >= threshold with ~97.7% confidence —
    LB >= threshold (JaccardSimilarity.java:148-155)."""
    lb, _, _ = jaccard(a, b)
    return lb >= threshold


def jaccard_estimate_arrays(
    theta_a: np.uint64, ha: np.ndarray, theta_b: np.uint64, hb: np.ndarray, k: int
) -> float:
    """Fast point-estimate J for the verify hot path (no bound math).

    ``ha``/``hb`` sorted distinct uint64 arrays; equivalent to
    jaccard(...)[1].
    """
    theta = min(theta_a, theta_b)
    merged = np.union1d(ha, hb)
    merged = merged[merged < theta]
    if len(merged) > k:
        merged = merged[:k]
    if len(merged) == 0:
        return 0.0
    inter = np.count_nonzero(
        np.isin(merged, ha, assume_unique=True) & np.isin(merged, hb, assume_unique=True)
    )
    return inter / len(merged)


def check_same_k(a: KmvSketch, b: KmvSketch) -> None:
    if a.k != b.k:
        raise SketchesArgumentError(f"sketch k mismatch: {a.k} != {b.k}")
