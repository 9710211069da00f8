"""HyperLogLog distinct-count sketch (dense registers), mergeable.

Engine analog of hll/HllSketch.java:39-97 (HLL_8 dense mode; we skip the
LIST/SET coupon promotion tiers — CurMode.java — since Arrow-batch updates
amortize register updates anyway; accuracy contract is the same RSE family).
lgK range 4..21 mirrors hll/HllUtil.java:48-49. Merge = register-wise max
(hll/Union.java:49-302). Estimator: standard Flajolet et al. HLL with
linear-counting small-range correction (public algorithm).
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


class HllSketch:
    def __init__(self, lg_k: int = 12):
        if not MIN_LG_K <= lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K},{MAX_LG_K}]")
        self.lg_k = lg_k
        self.m = 1 << lg_k
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized update from uniform uint64 hash values."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - self.lg_k)).astype(np.int64)
        rest = h << np.uint64(self.lg_k)
        # rho = leading zeros of remaining (64-lg_k)-bit stream + 1
        nz = rest != 0
        lz = np.full(len(h), 64 - self.lg_k, dtype=np.int64)
        if nz.any():
            # count leading zeros via float64 exponent trick is lossy;
            # use bit-length: lz = 63 - floor(log2(rest))
            r = rest[nz]
            hi = (r >> np.uint64(32)).astype(np.uint64)
            lo = (r & np.uint64(0xFFFFFFFF)).astype(np.uint64)
            bl_hi = np.zeros(len(r), dtype=np.int64)
            m_hi = hi != 0
            bl_hi[m_hi] = np.frexp(hi[m_hi].astype(np.float64))[1]
            bl_lo = np.frexp(lo.astype(np.float64))[1]
            bl = np.where(m_hi, bl_hi + 32, bl_lo)
            lz[nz] = 64 - bl
        rho = np.minimum(lz + 1, 64 - self.lg_k + 1).astype(np.uint8)
        np.maximum.at(self.regs, idx, rho)

    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.lg_k != self.lg_k:
            # downsample the larger-K sketch (hll/Union.java lgMaxK rule)
            a, b = (self, other) if self.lg_k <= other.lg_k else (other, self)
            fold = b.regs.reshape(a.m, -1).max(axis=1)
            if a is self:
                np.maximum(self.regs, fold, out=self.regs)
            else:
                merged = np.maximum(a.regs, fold)
                self.lg_k, self.m, self.regs = a.lg_k, a.m, merged
            return self
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = self.m
        inv = np.power(2.0, -self.regs.astype(np.float64))
        raw = _alpha(m) * m * m / inv.sum()
        zeros = int(np.count_nonzero(self.regs == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)
        return raw

    @property
    def rse(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def serialize(self) -> bytes:
        return bytes([self.lg_k]) + self.regs.tobytes()

    @staticmethod
    def deserialize(buf: bytes) -> "HllSketch":
        sk = HllSketch(buf[0])
        sk.regs = np.frombuffer(buf[1:], dtype=np.uint8).copy()
        return sk
