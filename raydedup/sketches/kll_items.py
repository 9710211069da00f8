"""KLL streaming quantiles over GENERIC comparable items (strings, tuples —
anything with a total order numpy can sort).

Engine analog of quantiles/ItemsSketch.java:150 / kll/KllItemsSketch: the
same Karnin-Lang-Liberty level hierarchy as sketches/kll.py but with
object-dtype level buffers, so e.g. "median path" or "p99 repo name by
lex order" queries over non-numeric columns have a home. Level compaction
sorts only the (small) level buffer, so the python-compare cost of object
sorting is bounded by k per compaction, not by n.

Rank semantics: INCLUSIVE (quantilescommon/QuantilesAPI.java:26-189), same
as the float sketch — quantile(r) = smallest retained item whose inclusive
rank >= r; matches DuckDB's quantile_disc for oracle checks.
"""

from __future__ import annotations

import math
import pickle
from typing import Any, Sequence

import numpy as np

from .kll import DEFAULT_K, _level_capacity


class KllItemsSketch:
    def __init__(self, k: int = DEFAULT_K, seed: int = 0):
        self.k = k
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=object)]
        self.n = 0
        self._rng = np.random.default_rng(seed ^ 0x17E5_C0DE)
        self._min: Any = None
        self._max: Any = None

    # -- update ------------------------------------------------------------

    def update_many(self, values: Sequence[Any]) -> None:
        items = [x for x in values if x is not None]
        if not items:
            return
        # element-wise fill: np.asarray(list_of_tuples, dtype=object) builds
        # a 2-D array, not a 1-D array of tuple objects — and tuples are an
        # advertised item type ("anything with a total order")
        v = np.empty(len(items), dtype=object)
        for i, x in enumerate(items):
            v[i] = x
        self.n += len(v)
        vmin, vmax = min(v), max(v)
        self._min = vmin if self._min is None else min(self._min, vmin)
        self._max = vmax if self._max is None else max(self._max, vmax)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def update(self, value: Any) -> None:
        self.update_many([value])

    def _capacity(self) -> int:
        return sum(
            _level_capacity(self.k, len(self.levels), i)
            for i in range(len(self.levels))
        )

    def _compress(self) -> None:
        while sum(len(l) for l in self.levels) > self._capacity():
            for i, lvl in enumerate(self.levels):
                if len(lvl) >= _level_capacity(self.k, len(self.levels), i) and len(lvl) >= 2:
                    srt = np.sort(lvl, kind="stable")
                    # odd length: leave one item behind (weight preservation)
                    if len(srt) % 2 == 1:
                        leftover = srt[:1]
                        srt = srt[1:]
                    else:
                        leftover = np.zeros(0, dtype=object)
                    offset = int(self._rng.integers(2))
                    promoted = srt[offset::2]
                    if i + 1 == len(self.levels):
                        self.levels.append(np.zeros(0, dtype=object))
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], promoted]
                    )
                    self.levels[i] = leftover
                    break
            else:
                break

    # -- merge -------------------------------------------------------------

    def merge(self, other: "KllItemsSketch") -> "KllItemsSketch":
        if other.n == 0:
            return self
        self.n += other.n
        for bound in (other._min, other._max):
            if bound is not None:
                self._min = bound if self._min is None else min(self._min, bound)
                self._max = bound if self._max is None else max(self._max, bound)
        for i, lvl in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.zeros(0, dtype=object))
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
            return np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def rank(self, q: Any) -> float:
        """Inclusive normalized rank of q."""
        if self.n == 0:
            return math.nan
        it, wt = self._weighted_items()
        # wrap q in a 0-d object array: a bare tuple would broadcast across
        # the object array instead of comparing as one item
        qq = np.empty((), dtype=object)
        qq[()] = q
        return float(wt[it <= qq].sum()) / self.n

    def quantile(self, r: float) -> Any:
        if self.n == 0:
            return None
        if r <= 0:
            return self._min
        if r >= 1:
            return self._max
        it, wt = self._weighted_items()
        cum = np.cumsum(wt)
        idx = int(np.searchsorted(cum, r * self.n, side="left"))
        return it[min(idx, len(it) - 1)]

    def quantiles(self, ranks: Sequence[float]) -> list[Any]:
        return [self.quantile(r) for r in ranks]

    @property
    def min_value(self) -> Any:
        return self._min

    @property
    def max_value(self) -> Any:
        return self._max

    @property
    def num_retained(self) -> int:
        return sum(len(l) for l in self.levels)

    # -- serde -------------------------------------------------------------

    def serialize(self) -> bytes:
        return pickle.dumps(
            {
                "k": self.k,
                "n": self.n,
                "min": self._min,
                "max": self._max,
                "levels": [list(l) for l in self.levels],
            }
        )

    @staticmethod
    def deserialize(buf: bytes) -> "KllItemsSketch":
        d = pickle.loads(buf)
        sk = KllItemsSketch(d["k"])
        sk.n = d["n"]
        sk._min, sk._max = d["min"], d["max"]
        sk.levels = [np.asarray(l, dtype=object) for l in d["levels"]]
        return sk
