"""CPC (Compressed Probabilistic Counting) distinct-count sketch.

Engine analog of cpc/CpcSketch.java:39-63 + cpc/CpcUnion.java:89-142,
implemented from the public algorithm (Kevin Lang, "Back to the Future: an
Even More Nearly Optimal Cardinality Estimation Algorithm", 2017):

* coupon mapping exactly as the reference's hashUpdate
  (CpcSketch.java:667-685): ``row = hash0 & (k-1)``,
  ``col = min(clz(hash1), 63)`` — P(col = j) = 2^-(j+1) (j < 63),
  P(col = 63) = 2^-63;
* state = the k×64 coupon bit matrix (row i stored as one uint64 mask).
  The IN-MEMORY matrix stays uncompressed — the reference's sliding-window
  pair table (CpcCompression.java) is a storage-size optimization that does
  not change estimator semantics — but every SERIALIZED form (what actually
  moves through Ray's combiner tree and the object store) is the reference's
  compressed wire image via interop_cpc, so shuffle bytes match the
  reference's ~1.3·k-bit entropy-coded size;
* union = bitwise OR of matrices with the reference's lgK-min downsampling
  rule (CpcUnion.java:89-142); row folding is exact because row bits are
  the LOW lgK bits and col is lgK-independent;
* estimator = ICON: numerically invert the exact coupon expectation
  E[C](n) = Σ_j k·(1 - (1 - p_j/k)^n) at the observed coupon count
  (IconEstimator.java fits the same function with precomputed tables; the
  direct inversion is equivalent up to numerical tolerance). Documented
  accuracy: RSE ≈ ln(2)/√k (CpcConfidence.java:35 iconErrorConstant);
  tests assert the streaming-validation contract
  (StreamingValidation.java:38 style trials).
"""

from __future__ import annotations

import math

import numpy as np

MIN_LG_K = 4
MAX_LG_K = 26
ICON_ERROR_CONSTANT = math.log(2.0)  # CpcConfidence.java:35
HIP_ERROR_CONSTANT = math.sqrt(math.log(2.0) / 2.0)  # CpcConfidence.java:36


def _clz64(h: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros of uint64 (64 for zero input)."""
    hi = (h >> np.uint64(32)).astype(np.uint64)
    lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    bl_hi = np.frexp(hi.astype(np.float64))[1]  # bit length, 0 for 0
    bl_lo = np.frexp(lo.astype(np.float64))[1]
    bl = np.where(hi != 0, bl_hi + 32, bl_lo)
    return (64 - bl).astype(np.int64)


class CpcSketch:
    def __init__(self, lg_k: int = 11):
        if not MIN_LG_K <= lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K},{MAX_LG_K}]")
        self.lg_k = lg_k
        self.k = 1 << lg_k
        self.matrix = np.zeros(self.k, dtype=np.uint64)
        # HIP state (CpcSketch.java:84-85, 578-585): a freshly built sketch
        # is an "updated" sketch (mergeFlag=false) whose HIP accumulator is
        # maintained on every NOVEL coupon and preferred by estimate();
        # merged/union results fall back to ICON (mergeFlag=true), exactly
        # the reference's getEstimate() rule (CpcSketch.java:138-141).
        self.merge_flag = False
        self.fi_col = 0
        self.kxp = float(self.k)
        self.hip_est_accum = 0.0

    def update_hash_pairs(self, hash0: np.ndarray, hash1: np.ndarray) -> None:
        """Vectorized coupon insertion from two independent uniform uint64
        hash words per item (CpcSketch.hashUpdate semantics). HIP is
        accumulated over the batch's novel coupons in stream order with one
        prefix-sum pass — the sequential updateHIP recurrence
        (CpcSketch.java:578-585: hip += k/kxp; kxp -= 2^-(col+1)) has the
        closed form kxp_i = kxp_0 - prefix(2^-(col+1)), so no Python loop."""
        h0 = np.asarray(hash0, dtype=np.uint64)
        h1 = np.asarray(hash1, dtype=np.uint64)
        if len(h0) == 0:
            return
        col = np.minimum(_clz64(h1), 63).astype(np.uint64)
        row = (h0 & np.uint64(self.k - 1)).astype(np.int64)
        bit = np.uint64(1) << col
        # novel coupons in stream order: not already in the matrix, first
        # occurrence within this batch
        known = (self.matrix[row] & bit) != 0
        rowcol = (row.astype(np.uint64) << np.uint64(6)) | col
        first = np.zeros(len(rowcol), dtype=bool)
        first[np.unique(rowcol, return_index=True)[1]] = True
        novel = np.flatnonzero(first & ~known)
        if len(novel):
            inv = np.ldexp(1.0, -(col[novel].astype(np.int64) + 1))
            kxp_before = self.kxp - np.concatenate([[0.0], np.cumsum(inv[:-1])])
            self.hip_est_accum += float((self.k / kxp_before).sum())
            self.kxp -= float(inv.sum())
        np.bitwise_or.at(self.matrix, row, bit)

    def update_hashes(self, hashes: np.ndarray) -> None:
        """ENGINE-INTERNAL single-word convenience (derives the second word
        with splitmix64). Not the reference ingest mapping — sketches built
        this way must not be merged with reference-built CPC images over
        overlapping items. Reference-parity callers (aggregates.cpc_distinct)
        feed both murmur3-128 words to :meth:`update_hash_pairs`, which IS
        CpcSketch.hashUpdate (CpcSketch.java:310-313, 667-684)."""
        from ..hashing import splitmix64

        h = np.asarray(hashes, dtype=np.uint64)
        self.update_hash_pairs(h, splitmix64(h ^ np.uint64(0xC9C)))

    @property
    def num_coupons(self) -> int:
        from ..simhash import popcount64

        if len(self.matrix) == 0:
            return 0
        return int(popcount64(self.matrix).sum())

    # -- estimator ----------------------------------------------------------

    def _expected_coupons(self, n: float) -> float:
        """E[C](n) for this k — exact per-cell occupancy expectation."""
        k = float(self.k)
        j = np.arange(64, dtype=np.float64)
        p = np.ldexp(1.0, -(j + 1).astype(np.int64))  # 2^-(j+1)
        p[63] = math.ldexp(1.0, -63)  # col 63 catches clz >= 63
        return float((k * -np.expm1(n * np.log1p(-p / k))).sum())

    def estimate(self) -> float:
        """Best estimate (CpcSketch.java:138-141): the HIP accumulator for
        never-merged sketches (maintained during update, RSE ≈ 0.589/√k),
        else ICON: n̂ = E[C]^{-1}(observed C), solved by bisection (E[C] is
        strictly increasing in n; RSE ≈ 0.693/√k)."""
        if not self.merge_flag:
            return self.hip_est_accum
        return self.icon_estimate()

    def icon_estimate(self) -> float:
        """ICON estimate regardless of merge state (IconEstimator role)."""
        c = self.num_coupons
        if c == 0:
            return 0.0
        lo, hi = 0.0, float(max(c, 1))
        while self._expected_coupons(hi) < c:
            lo, hi = hi, hi * 2.0
            if hi > 1e18:
                return hi
        for _ in range(80):
            mid = 0.5 * (lo + hi)
            if self._expected_coupons(mid) < c:
                lo = mid
            else:
                hi = mid
        return 0.5 * (lo + hi)

    @property
    def rse(self) -> float:
        """Documented relative standard error (CpcConfidence.java:34-36):
        HIP (0.589/√k) for never-merged sketches, ICON (0.693/√k) after a
        merge."""
        const = ICON_ERROR_CONSTANT if self.merge_flag else HIP_ERROR_CONSTANT
        return const / math.sqrt(self.k)

    def lower_bound(self, num_std_dev: float = 2.0) -> float:
        return self.estimate() / (1.0 + num_std_dev * self.rse)

    def upper_bound(self, num_std_dev: float = 2.0) -> float:
        return self.estimate() * (1.0 + num_std_dev * self.rse)

    # -- union --------------------------------------------------------------

    def merge(self, other: "CpcSketch") -> "CpcSketch":
        """Union (CpcUnion semantics): bitwise OR; mixed lgK downsamples to
        the smaller (row = low lgK bits → fold rows sharing low bits)."""
        self.merge_flag = True  # union results are merge-semantics (no HIP)
        self.hip_est_accum = 0.0
        self.kxp = float(self.k)
        if other.lg_k != self.lg_k:
            a, b = (self, other) if self.lg_k <= other.lg_k else (other, self)
            folded = np.bitwise_or.reduce(b.matrix.reshape(-1, a.k), axis=0)
            if a is self:
                self.matrix |= folded
            else:
                self.lg_k, self.k = a.lg_k, a.k
                self.matrix = a.matrix | folded
            return self
        self.matrix |= other.matrix
        return self

    # -- serde --------------------------------------------------------------

    def serialize(self) -> bytes:
        """Serde used by the Ray aggregate hot path: the reference's
        COMPRESSED wire image (interop_cpc) — lossless for the coupon
        matrix, HIP state (kxp/hipEstAccum/fiCol) and merge flag, and
        13–180× smaller than the raw 8·k-byte matrix, so combiner-tree
        partials shuffle at the reference's entropy-coded size
        (cpc/CpcCompression.java role). In-memory state stays the
        uncompressed matrix (documented trade-off in the module docstring)."""
        from raydedup.interop_cpc import cpc_to_reference_bytes

        return cpc_to_reference_bytes(self)

    @staticmethod
    def deserialize(buf: bytes) -> "CpcSketch":
        from raydedup.interop_cpc import cpc_from_reference_bytes

        return cpc_from_reference_bytes(buf)


def cpc_union(sketches: list[CpcSketch]) -> CpcSketch:
    """CpcUnion.java:89-142: downsample-to-min-lgK OR-merge."""
    if not sketches:
        return CpcSketch()
    out = CpcSketch(min(s.lg_k for s in sketches))
    for s in sketches:
        out.merge(s)
    return out
