"""UniqueCountMap — approximate distinct counts for millions of skewed keys.

Engine analog of hllmap/UniqueCountMap.java:24-172 with the same tiered
promotion idea (SingleCouponMap → coupon tiers → full HLL per hot key):
the long tail of keys stores raw "coupons" (exact) and only keys that
exceed ``promote_at`` coupons get real HLL registers — average memory stays
near tens of bytes per key on power-law streams (UniqueCountMap.java:36-43
documents ~10 B/key).

Representation is fully vectorized — this operator's whole reason to exist
is millions of skewed keys per block, so there is no Python step per key:

* coupon tier — two flat arrays ``(_ck, _ch)`` of (key, hash) pairs, kept
  sorted by (key, hash) and deduped; per-key exact counts are run lengths.
  Block absorption is one lexsort + run-boundary numpy pass (radix sort on
  int64 is O(n), so re-sorting the concatenated state stays linear per
  block).
* HLL tier — a register BANK: sorted hot-key array ``_hk`` plus a 2-D
  uint8 array ``_hregs`` of shape (n_hot, 2^lg_k). One ``np.maximum.at``
  over (row, slot) updates every hot key in a block at once; estimates for
  all hot keys come from one row-wise vectorized pass.

Slot/rho layout matches HllSketch (index = low lg_k bits, rho = clz of the
top 32 bits + 1), so promotion = replaying a key's coupons into its row.
Mergeable (per-block partials + merge), so it composes as a Ray AggregateFn
the same way the other sketches do.
"""

from __future__ import annotations

import numpy as np

from .hll import _composite_estimate_rows

PROMOTE_AT = 16


def _lexsort_pairs(k: np.ndarray, hh: np.ndarray) -> np.ndarray:
    """argsort by (key, hash) via 16-bit word decomposition — numpy's
    stable sort radixes int16/uint16, making this ~3.5x faster than a
    64-bit lexsort. The key's top word gets its sign bit flipped so
    negative int64 keys order correctly."""
    kv = k.view(np.uint16).reshape(-1, 4)
    hv = hh.view(np.uint16).reshape(-1, 4)
    top = kv[:, 3] ^ np.uint16(0x8000)  # bias: signed order on the MSW
    return np.lexsort(
        (hv[:, 0], hv[:, 1], hv[:, 2], hv[:, 3], kv[:, 0], kv[:, 1], kv[:, 2], top)
    )


def _slot_rho(h: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per hash — HllSketch._dense_update's layout."""
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    hi = (h >> np.uint64(32)).astype(np.uint64)
    bl = np.frexp(hi.astype(np.float64))[1]  # bit_length; 0 when hi == 0
    rho = (33 - bl).astype(np.uint8)
    return idx, rho


class UniqueCountMap:
    def __init__(self, lg_k: int = 10, promote_at: int = PROMOTE_AT):
        self.lg_k = lg_k
        self.m = 1 << lg_k
        self.promote_at = promote_at
        # coupon tier: (key, hash) pairs sorted by (key, hash), deduped
        self._ck = np.empty(0, dtype=np.int64)
        self._ch = np.empty(0, dtype=np.uint64)
        # HLL tier: sorted hot keys + one uint8 register row per key
        self._hk = np.empty(0, dtype=np.int64)
        self._hregs = np.empty((0, self.m), dtype=np.uint8)

    # -- updates ----------------------------------------------------------

    def update(self, key: int, id_hash: int) -> float:
        """Add one (key, identifier-hash) observation; returns the key's
        current distinct estimate (UniqueCountMap.update contract)."""
        self.update_block(
            np.array([key], dtype=np.int64),
            np.array([id_hash & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64),
        )
        return self.estimate(key)

    def update_many(self, keys: np.ndarray, id_hashes: np.ndarray) -> None:
        self.update_block(keys, id_hashes)

    def update_block(self, keys: np.ndarray, id_hashes: np.ndarray) -> None:
        """Vectorized block update: hot keys take one scatter-max into the
        register bank; the rest merge into the coupon arrays with one sort
        and run-boundary promotion. No Python step per key."""
        keys = np.asarray(keys, dtype=np.int64)
        h = np.asarray(id_hashes, dtype=np.uint64)
        if len(keys) == 0:
            return
        if len(self._hk):
            pos = np.searchsorted(self._hk, keys)
            posc = np.minimum(pos, len(self._hk) - 1)
            hot = self._hk[posc] == keys
        else:
            hot = np.zeros(len(keys), dtype=bool)
        if hot.any():
            idx, rho = _slot_rho(h[hot], self.m)
            np.maximum.at(self._hregs, (np.minimum(pos[hot], len(self._hk) - 1), idx), rho)
        cold = ~hot
        if cold.any():
            self._absorb_coupons(keys[cold], h[cold])

    def _absorb_coupons(self, k: np.ndarray, hh: np.ndarray) -> None:
        """Sorted-merge absorb: only the DELTA is sorted (the state stays
        sorted by invariant), then the two sorted pair-lists merge in O(n)
        — the state is never re-sorted, so per-block cost stays linear in
        the block regardless of how large the map has grown."""
        # sort + dedupe the incoming delta
        k = np.ascontiguousarray(k)
        hh = np.ascontiguousarray(hh)
        order = _lexsort_pairs(k, hh)
        k, hh = k[order], hh[order]
        keep = np.concatenate([[True], (k[1:] != k[:-1]) | (hh[1:] != hh[:-1])])
        k, hh = k[keep], hh[keep]
        nA = len(self._ck)
        if nA == 0:
            merged_k, merged_h = k, hh
        else:
            Ak, Ah = self._ck, self._ch
            lo = np.searchsorted(Ak, k, side="left")
            hi = np.searchsorted(Ak, k, side="right")
            # rank each delta pair within its state key-run by bisection on
            # the hash; runs are <= promote_at long (bigger runs promoted
            # out), so this converges in ~log2(promote_at) vector steps
            left, right = lo, hi
            while True:
                active = left < right
                if not active.any():
                    break
                mid = (left + right) >> 1
                midc = np.minimum(mid, nA - 1)
                go_right = active & (Ah[midc] < hh)
                left = np.where(go_right, mid + 1, left)
                right = np.where(active & ~go_right, mid, right)
            rB = left  # of A-pairs strictly before each delta pair
            rc = np.minimum(rB, nA - 1)
            dup = (rB < nA) & (Ak[rc] == k) & (Ah[rc] == hh)
            if dup.any():
                fresh = ~dup
                k, hh, rB = k[fresh], hh[fresh], rB[fresh]
            nB = len(k)
            pos_b = rB + np.arange(nB)
            # of delta pairs inserted before each state index i =
            # #{j: rB[j] <= i} — an O(nA) bincount prefix sum
            shift = np.cumsum(np.bincount(rB, minlength=nA + 1))[:nA]
            pos_a = np.arange(nA) + shift
            merged_k = np.empty(nA + nB, dtype=np.int64)
            merged_h = np.empty(nA + nB, dtype=np.uint64)
            merged_k[pos_a] = Ak
            merged_k[pos_b] = k
            merged_h[pos_a] = Ah
            merged_h[pos_b] = hh
        # promotion scan over run boundaries
        n = len(merged_k)
        new_run = np.concatenate([[True], merged_k[1:] != merged_k[:-1]])
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, n))
        promo = counts > self.promote_at
        if promo.any():
            promo_row = np.repeat(promo, counts)
            pk = merged_k[starts[promo]]  # promoted keys, sorted, unique
            ph = merged_h[promo_row]
            regs = np.zeros((len(pk), self.m), dtype=np.uint8)
            idx, rho = _slot_rho(ph, self.m)
            np.maximum.at(regs, (np.searchsorted(pk, merged_k[promo_row]), idx), rho)
            self._add_hot(pk, regs)
            merged_k, merged_h = merged_k[~promo_row], merged_h[~promo_row]
        self._ck, self._ch = merged_k, merged_h

    def _add_hot(self, pk: np.ndarray, regs: np.ndarray) -> None:
        """Merge (sorted unique keys, register rows) into the bank; rows for
        keys already hot fold by register max."""
        if len(self._hk) == 0:
            self._hk, self._hregs = pk, regs
            return
        allk = np.concatenate([self._hk, pk])
        allr = np.concatenate([self._hregs, regs])
        order = np.argsort(allk, kind="stable")
        allk, allr = allk[order], allr[order]
        dup = np.concatenate([[False], allk[1:] == allk[:-1]])
        if dup.any():
            out_idx = np.cumsum(~dup) - 1
            folded = np.zeros((int(out_idx[-1]) + 1, self.m), dtype=np.uint8)
            np.maximum.at(folded, out_idx, allr)
            self._hk, self._hregs = allk[~dup], folded
        else:
            self._hk, self._hregs = allk, allr

    # -- estimates --------------------------------------------------------

    def _est_rows(self, regs: np.ndarray) -> np.ndarray:
        """Vectorized HLL estimate per register row: the composite
        estimator (HllSketch's merged-state path — interpolation-corrected
        raw pasted with the bitmap estimator), one pass over the whole
        register bank with no Python step per key."""
        kxq = np.ldexp(1.0, -regs.astype(np.int64)).sum(axis=1)
        cur_min = regs.min(axis=1).astype(np.int64)
        n_at_min = (regs == cur_min[:, None]).sum(axis=1)
        return _composite_estimate_rows(self.lg_k, kxq, cur_min, n_at_min)

    def estimate(self, key: int) -> float:
        i = int(np.searchsorted(self._hk, key))
        if i < len(self._hk) and self._hk[i] == key:
            return float(self._est_rows(self._hregs[i : i + 1])[0])
        lo = int(np.searchsorted(self._ck, key, side="left"))
        hi = int(np.searchsorted(self._ck, key, side="right"))
        return float(hi - lo)

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted keys, their distinct estimates) — the map's full result
        table, one vectorized pass per tier. Coupon-tier keys are exact."""
        if len(self._ck):
            starts = np.flatnonzero(
                np.concatenate([[True], self._ck[1:] != self._ck[:-1]])
            )
            ckeys = self._ck[starts]
            cest = np.diff(np.append(starts, len(self._ck))).astype(np.float64)
        else:
            ckeys = np.empty(0, dtype=np.int64)
            cest = np.empty(0, dtype=np.float64)
        if len(self._hk):
            hkeys, hest = self._hk, self._est_rows(self._hregs)
        else:
            hkeys = np.empty(0, dtype=np.int64)
            hest = np.empty(0, dtype=np.float64)
        keys = np.concatenate([ckeys, hkeys])  # tiers are disjoint
        est = np.concatenate([cest, hest])
        order = np.argsort(keys)
        return keys[order], est[order]

    # -- merge ------------------------------------------------------------

    def merge(self, other: "UniqueCountMap") -> "UniqueCountMap":
        if other.lg_k != self.lg_k:
            raise ValueError("UniqueCountMap merge requires equal lg_k")
        if len(other._hk):
            self._add_hot(other._hk.copy(), other._hregs.copy())
            self._replay_coupons_for_hot()
        if len(other._ck):
            # coupons are raw hashes, so replaying them through the normal
            # block path routes to registers or coupons and re-promotes
            self.update_block(other._ck, other._ch)
        return self

    def _replay_coupons_for_hot(self) -> None:
        """Fold coupon entries whose key became hot into its register row."""
        if not len(self._ck) or not len(self._hk):
            return
        pos = np.searchsorted(self._hk, self._ck)
        posc = np.minimum(pos, len(self._hk) - 1)
        hot = self._hk[posc] == self._ck
        if hot.any():
            idx, rho = _slot_rho(self._ch[hot], self.m)
            np.maximum.at(self._hregs, (posc[hot], idx), rho)
            self._ck, self._ch = self._ck[~hot], self._ch[~hot]

    # -- introspection ----------------------------------------------------

    @property
    def hot_keys(self) -> np.ndarray:
        """Sorted keys promoted to HLL registers."""
        return self._hk

    @property
    def coupon_keys(self) -> np.ndarray:
        """Sorted distinct keys still in the exact coupon tier."""
        if not len(self._ck):
            return self._ck
        return self._ck[np.concatenate([[True], self._ck[1:] != self._ck[:-1]])]

    @property
    def active_keys(self) -> int:
        return len(self.coupon_keys) + len(self._hk)
