"""HyperLogLog distinct-count sketch with a sparse coupon tier, mergeable.

Engine analog of hll/HllSketch.java:39-97. Two modes, mirroring the
reference's CurMode promotion ladder (hll/CurMode.java LIST/SET → HLL):

* SPARSE — while few distinct values have been seen, the sketch keeps the
  raw 64-bit hash values in a set: exact counts and O(distinct) memory for
  the small-range regime (the role of the reference's LIST/SET coupon
  tiers; we keep full hashes instead of packed 32-bit coupons, trading a
  few bytes per entry for exactness — documented deviation).
* DENSE — past ``m/8`` entries the sparse set replays into 2^lgK registers
  (HLL_8 layout; the HLL_4/6 bit-packings are storage optimizations the
  engine skips).

Index and rho come from lgK-INDEPENDENT bit fields (index = low lg_k bits,
rho = clz of the top 32 bits + 1, like the reference's coupon layout in
hll/HllUtil.java), so cross-lgK register folding is an exact downsample.
lgK range 4..21 mirrors hll/HllUtil.java:48-49. Merge = register-wise max
(hll/Union.java:49-302); sparse inputs replay.

Estimators, preferred in the reference's order (hll/HllSketch.getEstimate →
hll/HllEstimators.java): a HIP accumulator maintained DURING dense updates
(hipAccum += m/kxq on every accepted register increase, then kxq adjusted —
AbstractHllArray.hipAndKxQIncrementalUpdate) serves never-merged sketches
at RSE ≈ 0.836/√m; merged (out-of-order) register state uses the composite
estimator (hll/HllEstimators.hllCompositeEstimate): the raw Flajolet
harmonic-mean estimate corrected by cubic interpolation through the
published (rawEst → trueN) anchor tables, pasted with a harmonic-number
bitmap (linear-counting) estimator in the small range via the reference's
averaged-crossover rule. The sequential HIP recurrence
vectorizes like CPC's: accepted updates are the per-slot strictly-rising
running-max subsequence (slot-sorted prefix max), and kxq_before each
accepted update has the closed form kxq_0 + exclusive-prefix-sum(Δ) in
stream order — no Python loop.
"""

from __future__ import annotations

import math

import numpy as np

MIN_LG_K = 4
MAX_LG_K = 21


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


# -- composite estimator helpers (hll/HllEstimators.java semantics) ----------

_EULER_MASCHERONI = 0.577215664901532860606512090082


def _harmonic_number(n: int) -> float:
    """H_n: exact partial sums below 25, Euler-Maclaurin expansion above
    (hll/HarmonicNumbers.java — same series truncation, so the two agree
    to double precision)."""
    if n < 25:
        return math.fsum(1.0 / k for k in range(1, n + 1))
    x = float(n)
    inv_sq = 1.0 / (x * x)
    s = math.log(x) + _EULER_MASCHERONI + 1.0 / (2.0 * x)
    p = inv_sq
    s -= p / 12.0
    p *= inv_sq
    s += p / 120.0
    p *= inv_sq
    s -= p / 252.0
    p *= inv_sq
    s += p / 240.0
    return s


def _bitmap_estimate(k: int, num_hit: int) -> float:
    """Coupon-collector estimate for a k-bit random-access bitmap with
    num_hit bits set: k·(H_k − H_{k−num_hit})."""
    return k * (_harmonic_number(k) - _harmonic_number(k - num_hit))


def _cubic_x_arr_y_stride(x_arr: np.ndarray, y_stride: float, x: float) -> float:
    """Lagrange cubic through four consecutive anchors of (x_arr[i],
    i·y_stride), window chosen as the reference does (CubicInterpolation.
    usingXArrAndYStride: straddle index shifted one left, clamped at both
    table ends)."""
    n = len(x_arr)
    if x == x_arr[n - 1]:
        return y_stride * (n - 1)
    straddle = int(np.searchsorted(x_arr, x, side="right")) - 1
    if straddle == 0:
        off = 0
    elif straddle == n - 2:
        off = n - 4
    else:
        off = straddle - 1
    xs = x_arr[off : off + 4]
    ys = y_stride * np.arange(off, off + 4, dtype=np.float64)
    total = 0.0
    for j in range(4):
        num = 1.0
        den = 1.0
        for i in range(4):
            if i != j:
                num *= x - xs[i]
                den *= xs[j] - xs[i]
        total += ys[j] * num / den
    return total


_H_EXACT = np.array([_harmonic_number(i) for i in range(25)])


def _harmonic_rows(n: np.ndarray) -> np.ndarray:
    """Vectorized H_n over an int array (same split as _harmonic_number)."""
    n = np.asarray(n, dtype=np.int64)
    out = np.empty(len(n), dtype=np.float64)
    small = n < 25
    if small.any():
        out[small] = _H_EXACT[n[small]]
    big = ~small
    if big.any():
        x = n[big].astype(np.float64)
        inv_sq = 1.0 / (x * x)
        s = np.log(x) + _EULER_MASCHERONI + 1.0 / (2.0 * x)
        p = inv_sq.copy()
        s -= p / 12.0
        p *= inv_sq
        s += p / 120.0
        p *= inv_sq
        s -= p / 252.0
        p *= inv_sq
        s += p / 240.0
        out[big] = s
    return out


def _composite_estimate_rows(
    lg_k: int, kxq: np.ndarray, cur_min: np.ndarray, num_at_cur_min: np.ndarray
) -> np.ndarray:
    """Vectorized composite estimator over many register rows at once (the
    hllmap register-bank path: one pass for every hot key, no Python step
    per key). Row semantics identical to the reference scalar algorithm."""
    from raydedup._hll_tables import X_ARRS, Y_STRIDES

    k = 1 << lg_k
    kxq = np.asarray(kxq, dtype=np.float64)
    raw = _alpha(k) * k * k / kxq
    x_arr = X_ARRS[lg_k - MIN_LG_K]
    y_stride = float(Y_STRIDES[lg_k - MIN_LG_K])
    n = len(x_arr)
    out = np.zeros(len(raw), dtype=np.float64)

    above = raw > x_arr[-1]
    out[above] = raw[above] * (y_stride * (n - 1) / x_arr[-1])
    at_top = raw == x_arr[-1]
    out[at_top] = y_stride * (n - 1)
    mid = (raw >= x_arr[0]) & ~above & ~at_top
    if mid.any():
        xm = raw[mid]
        straddle = np.searchsorted(x_arr, xm, side="right") - 1
        off = np.where(
            straddle == 0, 0, np.where(straddle == n - 2, n - 4, straddle - 1)
        )
        adj = np.zeros(len(xm), dtype=np.float64)
        # Lagrange cubic over the 4-anchor window, all rows at once
        xs = x_arr[off[:, None] + np.arange(4)]
        ys = y_stride * (off[:, None] + np.arange(4)).astype(np.float64)
        for j in range(4):
            num = np.ones(len(xm))
            den = np.ones(len(xm))
            for i in range(4):
                if i != j:
                    num *= xm - xs[:, i]
                    den *= xs[:, j] - xs[:, i]
            adj += ys[:, j] * num / den
        num_unhit = np.where(np.asarray(cur_min)[mid] == 0,
                             np.asarray(num_at_cur_min)[mid], 0)
        lin = np.where(
            num_unhit == 0,
            k * math.log(k / 0.5),
            k * (_harmonic_number(k) - _harmonic_rows(num_unhit)),
        )
        cross = 0.718 if lg_k == 4 else (0.672 if lg_k == 5 else 0.64)
        use_adj = (adj > 3.0 * k) | ((adj + lin) / 2.0 > cross * k)
        out[mid] = np.where(use_adj, adj, lin)
    return out


def _composite_estimate(lg_k: int, kxq: float, cur_min: int, num_at_cur_min: int) -> float:
    """The reference's non-HIP "composite" estimator for merged register
    state: interpolation-corrected raw estimate, pasted with the bitmap
    estimator in the small range via the averaged-crossover rule."""
    return float(
        _composite_estimate_rows(
            lg_k,
            np.array([kxq]),
            np.array([cur_min]),
            np.array([num_at_cur_min]),
        )[0]
    )


class HllSketch:
    def __init__(self, lg_k: int = 12):
        if not MIN_LG_K <= lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K},{MAX_LG_K}]")
        self.lg_k = lg_k
        self.m = 1 << lg_k
        self.sparse: set[int] | None = set()  # None once dense
        self.regs: np.ndarray | None = None
        # HIP state (hll/HllEstimators.java): hip_accum is maintained during
        # dense updates and preferred by estimate() while the sketch has
        # never been merged (not out_of_order). It starts at densify (the
        # sparse tier is exact and replays through the HIP update, exactly
        # like the reference's coupon→HLL promotion). kxq = Σ 2^-reg,
        # tracked incrementally; None until dense.
        self.out_of_order = False
        self.hip_accum: float | None = None
        self.kxq: float | None = None

    @property
    def is_sparse(self) -> bool:
        return self.sparse is not None

    def _sparse_limit(self) -> int:
        # densify when the sparse set would outgrow the register array
        return max(16, self.m // 8)

    def _densify(self) -> None:
        assert self.sparse is not None
        self.regs = np.zeros(self.m, dtype=np.uint8)
        pending = self.sparse
        self.sparse = None
        if not self.out_of_order:
            self.hip_accum = 0.0
            self.kxq = float(self.m)
        if pending:
            self._dense_update(np.fromiter(pending, dtype=np.uint64))

    def _kxq(self) -> float:
        """Incremental Σ 2^-reg; recomputed from registers on first need
        (wire-read in-order images carry hip but not the engine field)."""
        if self.kxq is None:
            self.kxq = float(np.ldexp(1.0, -self.regs.astype(np.int64)).sum())
        return self.kxq

    def _dense_update(self, h: np.ndarray) -> None:
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        hi = (h >> np.uint64(32)).astype(np.uint64)  # top 32 bits
        # bit_length of a 32-bit value via float64 exponent (exact <= 2^53)
        bl = np.frexp(hi.astype(np.float64))[1]  # 0 when hi == 0
        rho = (33 - bl).astype(np.uint8)  # clz32(hi) + 1, in [1, 33]
        if self.hip_accum is not None and not self.out_of_order:
            self._hip_update(idx, rho.astype(np.int64))
        np.maximum.at(self.regs, idx, rho)

    def _hip_update(self, idx: np.ndarray, rho: np.ndarray) -> None:
        """Accumulate HIP over this batch's accepted register increases in
        stream order. Accepted updates per slot form the strictly-rising
        running-max subsequence: slot-sort (stable), take the exclusive
        prefix max with a 64·slot offset so np.maximum.accumulate cannot
        leak across slot groups (cur_reg ≥ 0 makes each group's seed
        64·slot + cur exceed every earlier group's ceiling 64·slot − 1)."""
        order = np.argsort(idx, kind="stable")
        s_idx = idx[order]
        base = s_idx * 64
        comb = base + rho[order]
        bound = np.empty_like(comb)
        bound[0] = -1
        np.maximum.accumulate(comb[:-1], out=bound[1:])
        np.maximum(bound, base + self.regs[s_idx].astype(np.int64), out=bound)
        acc = np.flatnonzero(comb > bound)
        if not len(acc):
            return
        old_v = bound[acc] - base[acc]
        new_v = comb[acc] - base[acc]
        delta = np.ldexp(1.0, -new_v) - np.ldexp(1.0, -old_v)  # Δkxq < 0
        # the recurrence (hip += m/kxq; kxq += Δ) runs in STREAM order
        delta = delta[np.argsort(order[acc])]
        kxq0 = self._kxq()
        kxq_before = kxq0 + np.concatenate([[0.0], np.cumsum(delta[:-1])])
        self.hip_accum += float((self.m / kxq_before).sum())
        self.kxq = kxq0 + float(delta.sum())

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized update from uniform uint64 hash values."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        if self.sparse is not None:
            self.sparse.update(h.tolist())
            if len(self.sparse) > self._sparse_limit():
                self._densify()
            return
        self._dense_update(h)

    def merge(self, other: "HllSketch") -> "HllSketch":
        self.out_of_order = True  # merged state: HIP no longer valid
        self.hip_accum = None
        self.kxq = None
        if other.sparse is not None:
            # replay other's raw hashes (works across any lg_k)
            if other.sparse:
                self.update_hashes(np.fromiter(other.sparse, dtype=np.uint64))
            return self
        if self.sparse is not None:
            # self sparse, other dense: adopt the smaller lg_k dense layout
            mine = self.sparse
            self.sparse = None
            if other.lg_k < self.lg_k:
                self.lg_k, self.m = other.lg_k, other.m
            self.regs = np.zeros(self.m, dtype=np.uint8)
            if mine:
                self._dense_update(np.fromiter(mine, dtype=np.uint64))
        if other.lg_k != self.lg_k:
            # downsample the larger-K sketch (hll/Union.java lgMaxK rule).
            # Index = low lg_k bits, so slot i of the larger table folds to
            # slot i & (m_a - 1); rho is lgK-independent, so max-fold is the
            # exact downsample (same registers as building at lg_a directly).
            a, b = (self, other) if self.lg_k <= other.lg_k else (other, self)
            fold = b.regs.reshape(-1, a.m).max(axis=0)
            if a is self:
                np.maximum(self.regs, fold, out=self.regs)
            else:
                merged = np.maximum(a.regs, fold)
                self.lg_k, self.m, self.regs = a.lg_k, a.m, merged
            return self
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        if self.sparse is not None:
            return float(len(self.sparse))  # exact in the small-range regime
        if self.hip_accum is not None and not self.out_of_order:
            return self.hip_accum  # never-merged: HIP is the best estimate
        cur_min = int(self.regs.min())
        n_at_min = int(np.count_nonzero(self.regs == cur_min))
        return _composite_estimate(self.lg_k, self._kxq(), cur_min, n_at_min)

    @property
    def rse(self) -> float:
        if self.sparse is not None:
            return 0.0  # exact
        if self.hip_accum is not None and not self.out_of_order:
            return 0.8326 / math.sqrt(self.m)  # HIP, √(ln 2 / (1 − n/m)) → √ln2
        return 1.04 / math.sqrt(self.m)

    def serialize(self) -> bytes:
        if self.sparse is not None:
            arr = np.fromiter(self.sparse, dtype=np.uint64, count=len(self.sparse))
            arr.sort()
            return bytes([self.lg_k, 1]) + arr.astype("<u8").tobytes()
        # Dense state ships 4-bit packed (the reference's HLL_4 idea,
        # hll/Hll4Update.java): nibble = value - curMin clipped at 15, with
        # the rare overflows (P ≈ 2^-(14+curMin) per slot) as (value<<26|slot)
        # exception pairs. Halves the per-group aggregate state that moves
        # through the combiner tree versus the flat u8 register array.
        cur_min = int(self.regs.min())
        shifted = self.regs.astype(np.int64) - cur_min
        exc = shifted >= 15
        nibs = np.where(exc, 15, shifted).astype(np.uint8)
        packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
        slots = np.nonzero(exc)[0]
        pairs = (self.regs[slots].astype(np.uint32) << np.uint32(26)) | slots.astype(np.uint32)
        in_order = self.hip_accum is not None and not self.out_of_order
        import struct as _struct

        head = bytes([self.lg_k, 3, cur_min, 1 if in_order else 0])
        head += _struct.pack("<2d", self.hip_accum if in_order else 0.0,
                             self._kxq() if in_order else 0.0)
        return head + packed.tobytes() + pairs.astype("<u4").tobytes()

    @staticmethod
    def deserialize(buf: bytes) -> "HllSketch":
        import struct as _struct

        sk = HllSketch(buf[0])
        if buf[1] == 1:
            sk.sparse = set(np.frombuffer(buf[2:], dtype="<u8").tolist())
            sk.regs = None
        elif buf[1] in (2, 3):
            sk.sparse = None
            cur_min = buf[2]
            if buf[1] == 3:
                in_order = bool(buf[3])
                hip, kxq = _struct.unpack_from("<2d", buf, 4)
                if in_order:
                    sk.hip_accum, sk.kxq = hip, kxq
                else:
                    sk.out_of_order = True
                body = 20
            else:  # v2: pre-HIP dense image, merge-grade state only
                sk.out_of_order = True
                body = 3
            half = sk.m >> 1
            packed = np.frombuffer(buf, dtype=np.uint8, count=half, offset=body)
            nibs = np.empty(sk.m, dtype=np.uint8)
            nibs[0::2] = packed & 0xF
            nibs[1::2] = packed >> 4
            sk.regs = nibs + np.uint8(cur_min)
            pairs = np.frombuffer(buf, dtype="<u4", offset=body + half)
            if len(pairs):
                sk.regs[(pairs & np.uint32((1 << 26) - 1)).astype(np.intp)] = (
                    pairs >> np.uint32(26)
                ).astype(np.uint8)
        else:  # legacy flat u8 register array
            sk.sparse = None
            sk.regs = np.frombuffer(buf[2:], dtype=np.uint8).copy()
        return sk
