"""KLL streaming quantiles sketch for float64 values, mergeable.

Engine analog of kll/KllDoublesSketch (public Karnin-Lang-Liberty 2016
algorithm as realized in kll/KllSketch.java:61-75): a hierarchy of levels,
level i holding items of weight 2^i; when full, the lowest over-capacity
level is sorted and randomly halved (keep odd or even positions) into the
level above. Level capacities decay geometrically by c = 2/3 down from k,
with a floor of m = 8 — the same shape the reference uses. Contract: k=200
→ ~1.65% normalized rank error at 99% confidence (kll/KllSketch.java:71-72;
error fit kll/KllHelper.java:412-418); tests assert within that family.

Rank/quantile queries follow the INCLUSIVE search criterion of
quantilescommon/QuantilesAPI.java:26-189 (rank(q) = weight fraction of
items <= q; quantile(r) = smallest retained q whose inclusive rank >= r).
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_K = 200
_C = 2.0 / 3.0
_MIN_WIDTH = 8


def _level_capacity(k: int, num_levels: int, level: int) -> int:
    depth = num_levels - 1 - level
    return max(_MIN_WIDTH, int(math.ceil(k * (_C**depth))))


class KllSketch:
    def __init__(self, k: int = DEFAULT_K, seed: int = 0):
        self.k = k
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(seed ^ 0x5EED_C0DE)
        self._min = math.inf
        self._max = -math.inf

    # -- update ------------------------------------------------------------

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def update(self, value: float) -> None:
        self.update_many(np.array([value]))

    def _capacity(self) -> int:
        return sum(
            _level_capacity(self.k, len(self.levels), i)
            for i in range(len(self.levels))
        )

    def _compress(self) -> None:
        while sum(len(l) for l in self.levels) > self._capacity():
            for i, lvl in enumerate(self.levels):
                if len(lvl) >= _level_capacity(self.k, len(self.levels), i) and len(lvl) >= 2:
                    srt = np.sort(lvl)
                    # odd length: leave one item behind so each promoted item
                    # stands for exactly 2 removed ones — retained weight
                    # stays equal to n (reference leaves the odd item too)
                    if len(srt) % 2 == 1:
                        leftover = srt[:1]
                        srt = srt[1:]
                    else:
                        leftover = np.zeros(0, dtype=np.float64)
                    offset = int(self._rng.integers(2))
                    promoted = srt[offset::2]
                    if i + 1 == len(self.levels):
                        self.levels.append(np.zeros(0, dtype=np.float64))
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], promoted]
                    )
                    self.levels[i] = leftover
                    break
            else:
                break

    # -- merge -------------------------------------------------------------

    def merge(self, other: "KllSketch") -> "KllSketch":
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        for i, lvl in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.zeros(0, dtype=np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lvl])
        self._compress()
        return self

    # -- queries -----------------------------------------------------------

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 1 << i, dtype=np.int64))
        if not items:
            return np.zeros(0), np.zeros(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def rank(self, q: float) -> float:
        """Inclusive normalized rank of q."""
        if self.n == 0:
            return math.nan
        it, wt = self._weighted_items()
        return float(wt[it <= q].sum()) / self.n

    def quantile(self, r: float) -> float:
        if self.n == 0:
            return math.nan
        if r <= 0:
            return self._min
        if r >= 1:
            return self._max
        it, wt = self._weighted_items()
        cum = np.cumsum(wt)
        target = r * self.n
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(it) - 1)
        return float(it[idx])

    def quantiles(self, ranks: list[float]) -> list[float]:
        return [self.quantile(r) for r in ranks]

    def cdf(self, split_points: list[float]) -> list[float]:
        out = [self.rank(p) for p in split_points]
        return out + [1.0]

    def pmf(self, split_points: list[float]) -> list[float]:
        c = self.cdf(split_points)
        return [c[0]] + [c[i] - c[i - 1] for i in range(1, len(c))]

    @property
    def min_value(self) -> float:
        return self._min

    @property
    def max_value(self) -> float:
        return self._max

    @property
    def num_retained(self) -> int:
        return sum(len(l) for l in self.levels)

    @staticmethod
    def normalized_rank_error(k: int, pmf: bool = False) -> float:
        """Error fit mirroring kll/KllHelper.java:414-418 (public constants)."""
        if pmf:
            return 2.446 / (k**0.9433)
        return 2.296 / (k**0.9723)

    # -- serde -------------------------------------------------------------

    @staticmethod
    def ks_delta(a: "KllSketch", b: "KllSketch") -> float:
        """Kolmogorov-Smirnov statistic between two sketched distributions:
        max |CDF_a(x) - CDF_b(x)| over both sketches' retained items
        (quantiles/KolmogorovSmirnov.java:26-54 computeKSDelta). One sorted
        view + vectorized searchsorted per sketch (identical to evaluating
        rank() at every point, without rebuilding the view per point)."""
        ia, wa = a._weighted_items()
        ib, wb = b._weighted_items()
        pts = np.unique(np.concatenate([ia, ib]))
        if len(pts) == 0 or a.n == 0 or b.n == 0:
            return 0.0
        ca = np.concatenate([[0], np.cumsum(wa)])
        cb = np.concatenate([[0], np.cumsum(wb)])
        ra = ca[np.searchsorted(ia, pts, side="right")] / a.n
        rb = cb[np.searchsorted(ib, pts, side="right")] / b.n
        return float(np.abs(ra - rb).max())

    @staticmethod
    def ks_threshold(a: "KllSketch", b: "KllSketch", num_std_dev: float = 2.0) -> float:
        """Rejection threshold for ks_delta — the reference's
        computeKSThreshold (quantiles/KolmogorovSmirnov.java:82-93): a
        sampling-noise term sqrt(-ln(alpha/2)/2)·sqrt((r1+r2)/(r1·r2)) over
        the RETAINED counts (the classic two-sample KS critical value —
        without it, two small same-distribution samples always 'differ')
        plus both sketches' normalized rank errors. ``num_std_dev`` maps to
        the two-sided p-value alpha = erfc(z/sqrt(2))."""
        alpha = math.erfc(num_std_dev / math.sqrt(2.0))
        r1 = max(a.num_retained, 1)
        r2 = max(b.num_retained, 1)
        alpha_factor = math.sqrt(-0.5 * math.log(0.5 * alpha))
        delta_area = alpha_factor * math.sqrt((r1 + r2) / (r1 * r2))
        return (
            delta_area
            + KllSketch.normalized_rank_error(a.k)
            + KllSketch.normalized_rank_error(b.k)
        )

    @staticmethod
    def ks_test(a: "KllSketch", b: "KllSketch", num_std_dev: float = 2.0) -> bool:
        """True iff the two distributions are distinguishable at the given
        confidence (delta > threshold)."""
        return KllSketch.ks_delta(a, b) > KllSketch.ks_threshold(a, b, num_std_dev)

    def serialize(self) -> bytes:
        head = np.array([self.k, self.n, len(self.levels)], dtype=np.int64).tobytes()
        head += np.array([self._min, self._max], dtype=np.float64).tobytes()
        parts = [head]
        for lvl in self.levels:
            parts.append(np.array([len(lvl)], dtype=np.int64).tobytes())
            parts.append(np.ascontiguousarray(lvl, dtype="<f8").tobytes())
        return b"".join(parts)

    @staticmethod
    def deserialize(buf: bytes) -> "KllSketch":
        k, n, nlev = np.frombuffer(buf[:24], dtype=np.int64)
        sk = KllSketch(int(k))
        sk.n = int(n)
        sk._min, sk._max = np.frombuffer(buf[24:40], dtype=np.float64)
        pos = 40
        sk.levels = []
        for _ in range(nlev):
            ln = int(np.frombuffer(buf[pos : pos + 8], dtype=np.int64)[0])
            pos += 8
            sk.levels.append(
                np.frombuffer(buf[pos : pos + 8 * ln], dtype="<f8").astype(np.float64)
            )
            pos += 8 * ln
        return sk
