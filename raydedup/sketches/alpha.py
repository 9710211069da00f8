"""Alpha theta sketch — the reference's single-stream estimator
(theta/HeapAlphaSketch.java:61-565).

The alpha sketch trades mergeability-friendliness for a ~sqrt(2)-better
single-stream RSE than the QuickSelect sketch at equal k: instead of
retaining the k minimum hashes, theta itself is the estimator state.
After the (k+1)-th accepted insert, every further accepted insert
decrements ``theta *= alpha`` where ``alpha = k/(k+1)``
(HeapAlphaSketch.java:343-366), so the estimate in the asymptotic regime
is purely ``k * 2^63 / theta`` (HeapAlphaSketch.java:170-174) with
variance per the Kevin Lang derivation (HeapAlphaSketch.java:524-557,
RSE ≈ 1/sqrt(2k)).

Engine deviations from the reference, by design:

* Retained state is a hash set + max-heap, not an open-addressing table;
  "dirty" entries (>= theta after a decrement) are evicted eagerly when a
  later insert can reuse the slot (the reference's enhancedHashInsert
  replaces garbage only when it lies on the probe path,
  HeapAlphaSketch.java:382-444). The estimator is unaffected: in the
  estimation regime it depends only on theta, which both variants
  decrement once per accepted non-duplicate insert.
* Insertion order over a batch is preserved (the estimate is
  order-sensitive by construction; see AlphaSketch.update_hashes).

This is the driver-side / per-actor single-stream counter. The
distributed counting path stays on the mergeable KMV/QuickSelect
aggregates (aggregates.theta_distinct) — matching the reference's own
guidance that alpha is for single-stream use and unions of alpha
sketches go through the standard theta Union on the compact form
(theta/UnionImpl accepts any Sketch; compact() here yields a KmvSketch).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..config import SketchesArgumentError
from ..kmv import MAX_THETA, KmvSketch

_LONG_MAX_D = float(1 << 63)  # LONG_MAX_VALUE_AS_DOUBLE (Util.java)
ALPHA_MIN_LG_NOM = 9  # HeapAlphaSketch.java:62 — smallest k = 512
_REBUILD_THRESHOLD = 15.0 / 16.0  # ThetaUtil.REBUILD_THRESHOLD


class AlphaSketch:
    """Single-stream alpha theta sketch (HeapAlphaSketch semantics)."""

    def __init__(self, lg_k: int = 9, p: float = 1.0, seed: int = 9001):
        if lg_k < ALPHA_MIN_LG_NOM:
            raise SketchesArgumentError(
                f"alpha requires lg_k >= {ALPHA_MIN_LG_NOM} (k >= 512), got {lg_k}"
            )
        if not 0.0 < p <= 1.0:
            raise SketchesArgumentError(f"p must be in (0, 1]: {p}")
        self.lg_k = lg_k
        self.k = 1 << lg_k
        self.p = p
        self.seed = seed
        # alpha / split1 exactly as newHeapInstance (HeapAlphaSketch.java:99-101)
        self.alpha = self.k / (self.k + 1.0)
        self.split1 = int(((p * (self.alpha + 1.0)) / 2.0) * _LONG_MAX_D)
        self.theta = int(p * _LONG_MAX_D)
        self.empty = True
        self.dirty = False
        self._set: set[int] = set()
        self._maxheap: list[int] = []  # negated hashes for max access
        # rebuild threshold on the semantic table (lgArr = lg_k + 1 at target
        # size, HeapAlphaSketch.java:574-577)
        self._threshold = int(_REBUILD_THRESHOLD * (1 << (lg_k + 1)))

    # -- core update ------------------------------------------------------

    def update_hashes(self, theta_hashes: np.ndarray) -> None:
        """Insert pre-hashed values in (0, 2^63), preserving stream order.

        Batches are pre-filtered vectorized against the entry theta (theta
        only decreases, so anything >= theta now is rejected forever —
        HeapAlphaSketch.java:327-330), then the survivors take the
        sequential alpha path.
        """
        h = np.asarray(theta_hashes, dtype=np.uint64)
        if h.size == 0:
            return
        self.empty = False
        h = h[(h != np.uint64(0)) & (h < np.uint64(min(self.theta, 1 << 63)))]
        for v in h.tolist():
            self._update_one(v)

    def update(self, items) -> None:
        """Hash raw items (ints or strings) into the theta domain and insert
        with the reference ingest convention (UpdateSketch.update)."""
        import pyarrow as pa

        from ..aggregates import _column_theta_hashes

        tbl = pa.table({"v": pa.array(items)})
        self.update_hashes(_column_theta_hashes(tbl, "v", self.seed))

    def _update_one(self, h: int) -> None:
        if h >= self.theta:
            return  # RejectedOverTheta
        if h in self._set:
            return  # RejectedDuplicate
        if self.theta > self.split1:  # r == 0: exact/sampling regime
            self._insert(h)
            if len(self._set) > self.k:  # the (k+1)-th insert: enter sketch mode
                self.theta = int(float(self.theta) * self.alpha)
                self.dirty = True
            return
        # sketch mode (HeapAlphaSketch.java:343-366 + enhancedHashInsert)
        if self.dirty:
            g = self._pop_dirty()
            if g is not None:  # reuse a garbage slot: count not incremented
                self._set.discard(g)
                self._insert(h)
                self.theta = int(float(self.theta) * self.alpha)
                return
            self.dirty = False
        self._insert(h)
        self.theta = int(float(self.theta) * self.alpha)
        self.dirty = True
        if len(self._set) > self._threshold:
            self._rebuild_dirty()

    def _insert(self, h: int) -> None:
        self._set.add(h)
        heapq.heappush(self._maxheap, -h)

    def _pop_dirty(self) -> int | None:
        """Largest retained hash if it is dirty (>= theta), else None."""
        while self._maxheap:
            top = -self._maxheap[0]
            if top not in self._set:  # lazily dropped
                heapq.heappop(self._maxheap)
                continue
            return heapq.heappop(self._maxheap) * -1 if top >= self.theta else None
        return None

    def _rebuild_dirty(self) -> None:
        while True:
            g = self._pop_dirty()
            if g is None:
                break
            self._set.discard(g)
        self.dirty = False

    # -- accessors (Sketch API) -------------------------------------------

    def rebuild(self) -> "AlphaSketch":
        """Drop dirty entries (UpdateSketch.rebuild)."""
        self._rebuild_dirty()
        return self

    @property
    def is_estimation_mode(self) -> bool:
        return self.theta < (1 << 63)

    def retained_entries(self, valid: bool = True) -> int:
        if valid:
            return sum(1 for v in self._set if v < self.theta)
        return len(self._set)

    def estimate(self) -> float:
        """HeapAlphaSketch.getEstimate:170-174."""
        if self.theta > self.split1:
            return len(self._set) * (_LONG_MAX_D / float(self.theta))
        return self.k * (_LONG_MAX_D / float(self.theta))

    def _variance(self) -> float:
        """Kevin Lang's alpha variance (HeapAlphaSketch.java:524-557)."""
        k, p, alpha = float(self.k), self.p, self.alpha
        theta = float(self.theta) / _LONG_MAX_D
        count = self.retained_entries(True)
        y = 1.0 / p
        y_sq_minus_y = y * y - y
        split1 = (p * (alpha + 1.0)) / 2.0
        if theta > split1:
            result = count * y_sq_minus_y
        elif theta > alpha * split1:
            result = (k + 1.0) * y_sq_minus_y
        else:
            b = 1.0 / alpha
            x = p / theta
            term1 = (k + 1.0) * y_sq_minus_y
            term2 = y / (1.0 - b * b)
            term3 = (y * b * b) - (y * x * x) - b - (b * b) + x + (x * b)
            result = term1 + term2 * term3
        return result + (1.0 - theta) / (theta * theta)

    def lower_bound(self, num_std_dev: int = 2) -> float:
        if not 1 <= num_std_dev <= 3:
            raise SketchesArgumentError("numStdDev must be 1, 2 or 3")
        if not self.is_estimation_mode:
            return float(len(self._set))
        if self.retained_entries(True) == 0:
            return 0.0
        return max(self.estimate() - num_std_dev * self._variance() ** 0.5, 0.0)

    def upper_bound(self, num_std_dev: int = 2) -> float:
        if not 1 <= num_std_dev <= 3:
            raise SketchesArgumentError("numStdDev must be 1, 2 or 3")
        if not self.is_estimation_mode:
            return float(len(self._set))
        return self.estimate() + num_std_dev * self._variance() ** 0.5

    def compact(self) -> KmvSketch:
        """Compact-ordered theta form (valid entries only) — the shape the
        engine's union/intersection/AnotB algebra consumes, mirroring how
        the reference unions alpha sketches via the generic theta Union."""
        valid = np.array(
            sorted(v for v in self._set if v < self.theta), dtype=np.uint64
        )
        theta = MAX_THETA if not self.is_estimation_mode else np.uint64(self.theta)
        return KmvSketch(theta=theta, hashes=valid, k=self.k)
