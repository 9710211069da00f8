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
        """Vectorized update from uniform uint64 hash values.

        Index and rho come from disjoint, lgK-INDEPENDENT bit fields
        (index = low lg_k bits, rho = leading zeros of the top 32 bits + 1),
        mirroring the reference's coupon layout (hll/HllUtil.java: slotNo
        from low bits of one word, value from clz of another). This makes
        cross-lgK register folding exact: the same element always produces
        the same rho regardless of lg_k.
        """
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        hi = (h >> np.uint64(32)).astype(np.uint64)  # top 32 bits
        # bit_length of a 32-bit value via float64 exponent (exact <= 2^53)
        bl = np.frexp(hi.astype(np.float64))[1]  # 0 when hi == 0
        rho = (33 - bl).astype(np.uint8)  # clz32(hi) + 1, in [1, 33]
        np.maximum.at(self.regs, idx, rho)

    def merge(self, other: "HllSketch") -> "HllSketch":
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
