"""REQ — relative-error streaming quantiles (HRA/LRA), mergeable.

Engine analog of req/ReqSketch.java:35-59 (public algorithm: Cormode,
Karnin, Liberty, Thaler, Veselý, "Relative Error Streaming Quantiles",
PODS 2021). Accuracy concentrates at one end of the rank domain:

* HRA (high-rank accuracy, default): relative error ∝ (1 - rank) — the
  top quantiles (p99, p999) are near-exact.
* LRA: mirrored (low ranks near-exact).

Structure: a stack of compactors; level h items carry weight 2^h. A
compactor keeps its highest-rank ``protected`` section uncompacted (HRA)
and lazily compacts the rest by promoting a random odd/even half — the
number of protected sections shrinks as the compaction counter grows (the
paper's section-deprotection schedule realized via the counter's trailing
bits). Merge concatenates per-level buffers and re-compacts.
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_K = 12  # section size (items); paper default accuracy knob


class _Compactor:
    __slots__ = ("sec_size", "num_sections", "state", "items", "hra", "rng")

    def __init__(self, sec_size: int, hra: bool, rng: np.random.Generator):
        self.sec_size = sec_size
        self.num_sections = 3
        self.state = 0  # compaction counter
        self.items = np.zeros(0, dtype=np.float64)
        self.hra = hra
        self.rng = rng

    @property
    def capacity(self) -> int:
        return 2 * self.num_sections * self.sec_size

    def compact(self) -> np.ndarray:
        """Compact one region; returns promoted items for the next level."""
        srt = np.sort(self.items)
        # number of sections to compact: trailing-ones schedule over state
        t = self.state
        secs = 1
        while t & 1:
            secs += 1
            t >>= 1
        secs = min(secs, self.num_sections - 1) if self.num_sections > 1 else 1
        region = secs * self.sec_size
        region = min(region, len(srt) // 2 if len(srt) >= 2 else 0)
        if region < 2:
            region = min(2, len(srt))
        # even region: each promoted item stands for exactly 2 removed ones,
        # so retained weight stays equal to n (same invariant as KLL)
        region &= ~1
        if self.hra:
            # protect the HIGH end: compact the lowest `region` items
            comp, keep = srt[:region], srt[region:]
        else:
            comp, keep = srt[len(srt) - region :], srt[: len(srt) - region]
        offset = int(self.rng.integers(2))
        promoted = comp[offset::2]
        self.items = keep
        self.state += 1
        # section-count doubling schedule (ReqCompactor ensureEnoughSections)
        if self.state >= (1 << (self.num_sections - 1)) and self.num_sections < 16:
            self.num_sections *= 2
        return promoted

    def extend(self, vals: np.ndarray) -> None:
        self.items = np.concatenate([self.items, vals])


class ReqSketch:
    def __init__(self, k: int = DEFAULT_K, hra: bool = True, seed: int = 0):
        self.k = k
        self.hra = hra
        self.n = 0
        self._rng = np.random.default_rng(seed + 0x5EC)
        self.compactors: list[_Compactor] = [_Compactor(k, hra, self._rng)]
        self._min = math.inf
        self._max = -math.inf

    def _grow(self) -> None:
        self.compactors.append(_Compactor(self.k, self.hra, self._rng))

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.compactors[0].extend(v)
        self._compress()

    def update(self, value: float) -> None:
        self.update_many(np.array([value]))

    def _compress(self) -> None:
        h = 0
        while h < len(self.compactors):
            c = self.compactors[h]
            while len(c.items) >= c.capacity:
                promoted = c.compact()
                if h + 1 == len(self.compactors):
                    self._grow()
                self.compactors[h + 1].extend(promoted)
            h += 1

    def merge(self, other: "ReqSketch") -> "ReqSketch":
        if other.hra != self.hra:
            raise ValueError("cannot merge HRA with LRA REQ sketches")
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        for h, oc in enumerate(other.compactors):
            if h == len(self.compactors):
                self._grow()
            self.compactors[h].extend(oc.items)
            self.compactors[h].state = max(self.compactors[h].state, oc.state)
        self._compress()
        return self

    # -- queries -----------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, c in enumerate(self.compactors):
            if len(c.items):
                items.append(c.items)
                weights.append(np.full(len(c.items), 1 << h, dtype=np.int64))
        if not items:
            return np.zeros(0), np.zeros(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def rank(self, q: float) -> float:
        if self.n == 0:
            return math.nan
        it, wt = self._weighted()
        return float(wt[it <= q].sum()) / self.n

    def quantile(self, r: float) -> float:
        if self.n == 0:
            return math.nan
        if r <= 0:
            return self._min
        if r >= 1:
            return self._max
        it, wt = self._weighted()
        cum = np.cumsum(wt)
        idx = int(np.searchsorted(cum, r * self.n, side="left"))
        return float(it[min(idx, len(it) - 1)])

    @property
    def num_retained(self) -> int:
        return sum(len(c.items) for c in self.compactors)

    def rse(self, rank: float) -> float:
        """Approximate relative standard error at a rank, dimensionless in
        [0, 1] (BaseReqSketch.getRSE contract): ~0.084/k scaled by the
        distance from the accurate end (HRA: accurate near rank 1)."""
        d = (1.0 - rank) if self.hra else rank
        return 0.084 / self.k * max(d, 1e-12)
