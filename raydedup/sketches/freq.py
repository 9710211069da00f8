"""Misra-Gries frequent-items sketch over int64/uint64 keys.

Engine analog of frequencies/LongsSketch.java:55-94 (same algorithm family:
Misra-Gries generalization with a decrement offset). Contracts mirrored:

* ``get_estimate(item)`` ∈ [true - maxError, true] (upper-bound estimator:
  est = count + offset).
* ``get_frequent_items(threshold, NO_FALSE_NEGATIVES)`` returns every item
  with true count > threshold (plus possible false positives) — the
  guarantee we rely on for hot-LSH-bucket detection
  (frequencies/LongsSketch.java:66-67, ErrorType.java).
* ``merge`` is associative/commutative with error adding
  (LongsSketch.java merge: offsets add).

Vectorized batch update: exact per-batch counts via np.unique, then a
bounded merge — equivalent to a sequence of single updates followed by
purges (ReversePurgeLongHashMap semantics), with the same error bound
because every purge decrements all counters equally.
"""

from __future__ import annotations

import numpy as np

NO_FALSE_NEGATIVES = "NO_FALSE_NEGATIVES"
NO_FALSE_POSITIVES = "NO_FALSE_POSITIVES"


class FrequentKeysSketch:
    def __init__(self, max_map_size: int = 4096):
        self.max_map_size = int(max_map_size)
        self.counts: dict[int, int] = {}
        self.offset = 0  # total decremented per surviving key
        self.stream_len = 0

    def update_many(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        if counts is not None:
            # pre-aggregated input
            k, c = np.asarray(keys), np.asarray(counts)
        else:
            k, c = np.unique(np.asarray(keys), return_counts=True)
        self.stream_len += int(c.sum())
        d = self.counts
        for key, cnt in zip(k.tolist(), c.tolist()):
            d[key] = d.get(key, self.offset) + int(cnt)
        self._maybe_purge()

    def update(self, key: int, count: int = 1) -> None:
        self.stream_len += count
        self.counts[key] = self.counts.get(key, self.offset) + count
        self._maybe_purge()

    def _maybe_purge(self) -> None:
        while len(self.counts) > self.max_map_size:
            # decrement by the median of the LOWER-BOUND counts (value minus
            # current offset) — classic MG purge (ReversePurgeLongHashMap
            # "sample median" step). Using raw values here would feed the
            # offset back into itself and grow it exponentially across
            # merges of many partials.
            off = self.offset
            lbs = np.fromiter(
                (v - off for v in self.counts.values()),
                dtype=np.int64,
                count=len(self.counts),
            )
            dec = max(1, int(np.median(lbs)))
            self.offset += dec
            self.counts = {k: v for k, v in self.counts.items() if v - self.offset > 0}

    def merge(self, other: "FrequentKeysSketch") -> "FrequentKeysSketch":
        self.stream_len += other.stream_len
        if other.offset:
            # keys retained only in self may have been seen by other's
            # stream and purged there up to other.offset times — their
            # stored upper bound must grow by other.offset too, or the
            # v >= true-count invariant (NO_FALSE_NEGATIVES) breaks
            for k in self.counts:
                if k not in other.counts:
                    self.counts[k] += other.offset
        for k, v in other.counts.items():
            # merge upper-bound counts (both sides carry their offsets)
            self.counts[k] = self.counts.get(k, self.offset) + v
        self.offset += other.offset
        self._maybe_purge()
        return self

    def get_estimate(self, key: int) -> int:
        v = self.counts.get(key)
        return 0 if v is None else v

    @property
    def maximum_error(self) -> int:
        return self.offset

    def get_frequent_items(
        self, threshold: int | None = None, error_type: str = NO_FALSE_NEGATIVES
    ) -> list[tuple[int, int]]:
        thr = self.maximum_error if threshold is None else threshold
        out = []
        for k, v in self.counts.items():
            est_ub = v  # upper bound
            est_lb = v - self.offset  # lower bound
            if error_type == NO_FALSE_NEGATIVES:
                if est_ub > thr:
                    out.append((k, est_ub))
            else:
                if est_lb > thr:
                    out.append((k, est_lb))
        out.sort(key=lambda t: -t[1])
        return out

    def serialize(self) -> bytes:
        items = np.fromiter(self.counts.keys(), dtype=np.int64, count=len(self.counts))
        vals = np.fromiter(self.counts.values(), dtype=np.int64, count=len(self.counts))
        head = np.array(
            [self.max_map_size, self.offset, self.stream_len, len(items)], dtype=np.int64
        )
        return head.tobytes() + items.tobytes() + vals.tobytes()

    @staticmethod
    def deserialize(buf: bytes) -> "FrequentKeysSketch":
        head = np.frombuffer(buf[:32], dtype=np.int64)
        sk = FrequentKeysSketch(int(head[0]))
        sk.offset = int(head[1])
        sk.stream_len = int(head[2])
        n = int(head[3])
        items = np.frombuffer(buf[32 : 32 + 8 * n], dtype=np.int64)
        vals = np.frombuffer(buf[32 + 8 * n : 32 + 16 * n], dtype=np.int64)
        sk.counts = dict(zip(items.tolist(), vals.tolist()))
        return sk


class FrequentItemsSketch(FrequentKeysSketch):
    """Misra-Gries frequent items over GENERIC hashable items (strings, …)
    — engine analog of frequencies/ItemsSketch.java:150. Same algorithm,
    bounds and merge semantics as the int64 sketch; items stay items (no
    pre-hashing, so the result still carries the original payloads).

    Batch updates should pass pre-aggregated (keys, counts) — e.g. from
    ``pyarrow.compute.value_counts`` — so the python dict loop is bounded
    by the number of DISTINCT items in the batch."""

    def update_many(self, keys, counts=None) -> None:  # type: ignore[override]
        if counts is None:
            ks, cs = np.unique(np.asarray(keys, dtype=object), return_counts=True)
        else:
            ks, cs = list(keys), np.asarray(counts)
        self.stream_len += int(np.sum(cs))
        d = self.counts
        for key, cnt in zip(list(ks), np.asarray(cs).tolist()):
            d[key] = d.get(key, self.offset) + int(cnt)
        self._maybe_purge()

    def serialize(self) -> bytes:  # type: ignore[override]
        import pickle

        return pickle.dumps(
            (self.max_map_size, self.offset, self.stream_len, self.counts)
        )

    @staticmethod
    def deserialize(buf: bytes) -> "FrequentItemsSketch":  # type: ignore[override]
        import pickle

        mms, off, sl, counts = pickle.loads(buf)
        sk = FrequentItemsSketch(mms)
        sk.offset, sk.stream_len, sk.counts = off, sl, counts
        return sk
