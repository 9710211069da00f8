"""UniqueCountMap — approximate distinct counts for millions of skewed keys.

Engine analog of hllmap/UniqueCountMap.java:24-172 with the same tiered
promotion idea (SingleCouponMap → coupon tiers → full HLL per hot key):
the long tail of keys stores raw "coupons" (small int sets, exact) and only
keys that exceed ``promote_at`` coupons get a real HLL sketch — average
memory stays near tens of bytes per key on power-law streams
(UniqueCountMap.java:36-43 documents ~10 B/key).

Mergeable (per-block partials + merge), so it composes as a Ray AggregateFn
the same way the other sketches do.
"""

from __future__ import annotations

import numpy as np

from .hll import HllSketch

PROMOTE_AT = 16


class UniqueCountMap:
    def __init__(self, lg_k: int = 10, promote_at: int = PROMOTE_AT):
        self.lg_k = lg_k
        self.promote_at = promote_at
        self.coupons: dict[int, set[int]] = {}
        self.hlls: dict[int, HllSketch] = {}

    def update(self, key: int, id_hash: int) -> float:
        """Add one (key, identifier-hash) observation; returns the key's
        current distinct estimate (UniqueCountMap.update contract)."""
        sk = self.hlls.get(key)
        if sk is not None:
            sk.update_hashes(np.array([id_hash], dtype=np.uint64))
            return sk.estimate()
        c = self.coupons.setdefault(key, set())
        c.add(id_hash & 0xFFFFFFFFFFFFFFFF)
        if len(c) > self.promote_at:
            self._promote(key)
            return self.hlls[key].estimate()
        return float(len(c))

    def update_many(self, keys: np.ndarray, id_hashes: np.ndarray) -> None:
        for k, h in zip(keys.tolist(), id_hashes.tolist()):
            self.update(int(k), int(h))

    def update_block(self, keys: np.ndarray, id_hashes: np.ndarray) -> None:
        """Block update paying one Python step per DISTINCT key in the block
        (lexsort + run boundaries), not one per row — the map_batches hot
        path. Semantics identical to update() per row."""
        keys = np.asarray(keys, dtype=np.int64)
        h = np.asarray(id_hashes, dtype=np.uint64)
        if len(keys) == 0:
            return
        order = np.lexsort((h, keys))
        k_s, h_s = keys[order], h[order]
        starts = np.flatnonzero(np.concatenate([[True], k_s[1:] != k_s[:-1]]))
        bounds = np.append(starts, len(k_s))
        for i, s in enumerate(starts):
            key = int(k_s[s])
            run = h_s[s : bounds[i + 1]]
            sk = self.hlls.get(key)
            if sk is not None:
                sk.update_hashes(run)
                continue
            c = self.coupons.setdefault(key, set())
            c.update(run.tolist())
            if len(c) > self.promote_at:
                self._promote(key)

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted keys, their distinct estimates) — the map's full result
        table. Coupon-tier keys report exact counts."""
        ks = sorted(set(self.coupons) | set(self.hlls))
        return (
            np.array(ks, dtype=np.int64),
            np.array([self.estimate(k) for k in ks], dtype=np.float64),
        )

    def _promote(self, key: int) -> None:
        sk = HllSketch(self.lg_k)
        sk.update_hashes(np.fromiter(self.coupons.pop(key), dtype=np.uint64))
        self.hlls[key] = sk

    def estimate(self, key: int) -> float:
        sk = self.hlls.get(key)
        if sk is not None:
            return sk.estimate()
        return float(len(self.coupons.get(key, ())))

    def merge(self, other: "UniqueCountMap") -> "UniqueCountMap":
        for key, c in other.coupons.items():
            if key in self.hlls:
                self.hlls[key].update_hashes(np.fromiter(c, dtype=np.uint64))
            else:
                mine = self.coupons.setdefault(key, set())
                mine |= c
                if len(mine) > self.promote_at:
                    self._promote(key)
        for key, sk in other.hlls.items():
            if key in self.hlls:
                self.hlls[key].merge(sk)
            else:
                clone = HllSketch.deserialize(sk.serialize())  # mode-safe copy
                if key in self.coupons:
                    clone.update_hashes(
                        np.fromiter(self.coupons.pop(key), dtype=np.uint64)
                    )
                self.hlls[key] = clone
        return self

    @property
    def active_keys(self) -> int:
        return len(self.coupons) + len(self.hlls)
