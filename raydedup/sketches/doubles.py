"""Classic quantiles DoublesSketch (mergeable), with wire-format interop.

Engine analog of the reference's original quantiles family
(quantiles/DoublesSketch.java:40-70): a base buffer of 2k weight-1 items
plus logarithmic levels, level i holding exactly k sorted items of weight
2^(i+1). When the base buffer fills it is sorted and "zipped" (random
even/odd offset keeps every estimate unbiased) into the lowest invalid
level with a binary ripple carry (quantiles/DoublesUpdateImpl.java:99-150).
Merging feeds the source base buffer through update and carries each valid
source level into the target (quantiles/DoublesMergeImpl.java:60-126),
down-sampling by zip-with-stride when source k > target k
(quantiles/DoublesMergeImpl.java:140-210). The level bit pattern is always
n // (2k) (quantiles/ClassicUtil.java:275-277).

Rank/quantile queries follow the reference sorted-view semantics
(quantiles/DoublesSketchSortedView.java getQuantile/getRank): INCLUSIVE
uses natural rank ceil(r*n) with a >= search, EXCLUSIVE floor(r*n) with a
> search. Accuracy contract: normalized rank error 1.725% at k=128
(table at quantiles/DoublesSketch.java:53-64; fitted formula
quantiles/ClassicUtil.java getNormalizedRankError).

Binary interop: ``serialize`` writes the reference's SerVer-3 compact
ordered DoublesSketch image and ``deserialize`` reads SerVer 1 (v0.3.x,
non-compact, 5 preamble longs), SerVer 2 (v0.6.x, compact) and SerVer 3
images, byte-layout per quantiles/PreambleUtil.java:41-100 and
quantiles/HeapUpdateDoublesSketch.java:276-319 — conformance-tested
against the reference's own golden ``Qk128_n*_v0.*.sk`` resources.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from raydedup.config import SketchesArgumentError

DEFAULT_K = 128
MIN_K = 2
MAX_K = 1 << 15

_FAMILY_QUANTILES = 8
_SER_VER = 3

_BIG_ENDIAN_FLAG = 1
_READ_ONLY_FLAG = 2
_EMPTY_FLAG = 4
_COMPACT_FLAG = 8
_ORDERED_FLAG = 16


def normalized_rank_error(k: int, pmf: bool = False) -> float:
    """Fitted rank-error bound (quantiles/ClassicUtil.java
    getNormalizedRankError): 1.725% at k=128 single-sided."""
    return 1.854 / k**0.9657 if pmf else 1.576 / k**0.9726


class DoublesSketch:
    """Heap classic quantiles sketch over float64 values."""

    def __init__(self, k: int = DEFAULT_K, seed: int = 0):
        if not (MIN_K <= k <= MAX_K) or k & (k - 1):
            raise SketchesArgumentError(f"k must be a power of 2 in [2, 2^15]: {k}")
        self.k = k
        self.n = 0
        self._min = math.inf
        self._max = -math.inf
        self._bb: np.ndarray = np.zeros(0, dtype=np.float64)  # unsorted, < 2k items
        self._levels: dict[int, np.ndarray] = {}  # level -> sorted k items
        self._rng = np.random.default_rng(seed ^ 0xD0B1E5)

    # -- state helpers -----------------------------------------------------

    @property
    def bit_pattern(self) -> int:
        bp = 0
        for lvl in self._levels:
            bp |= 1 << lvl
        return bp

    def is_empty(self) -> bool:
        return self.n == 0

    def is_estimation_mode(self) -> bool:
        return bool(self._levels)

    def num_retained(self) -> int:
        return len(self._bb) + sum(len(v) for v in self._levels.values())

    def min_item(self) -> float:
        return self._min

    def max_item(self) -> float:
        return self._max

    # -- update ------------------------------------------------------------

    def update(self, value: float) -> None:
        self.update_many(np.array([value], dtype=np.float64))

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        two_k = 2 * self.k
        pos = 0
        while pos < len(v):
            room = two_k - len(self._bb)
            chunk = v[pos : pos + room]
            self._bb = np.concatenate([self._bb, chunk])
            self.n += len(chunk)
            pos += len(chunk)
            if len(self._bb) == two_k:
                self._propagate_full_bb()

    def _zip(self, sorted_2k: np.ndarray) -> np.ndarray:
        """Random even/odd zip of a sorted 2k buffer to k items
        (quantiles/DoublesUpdateImpl.java zipSize2KBuffer)."""
        offset = int(self._rng.integers(2))
        return sorted_2k[offset::2].copy()

    def _carry_in(self, k_buf: np.ndarray, starting_level: int) -> None:
        """Ripple-carry a sorted size-k buffer into the levels
        (quantiles/DoublesUpdateImpl.java inPlacePropagateCarry)."""
        lvl = starting_level
        while lvl in self._levels:
            merged = np.sort(np.concatenate([self._levels.pop(lvl), k_buf]))
            k_buf = self._zip(merged)
            lvl += 1
        self._levels[lvl] = k_buf

    def _propagate_full_bb(self) -> None:
        srt = np.sort(self._bb)
        self._bb = np.zeros(0, dtype=np.float64)
        self._carry_in(self._zip(srt), 0)

    # -- merge -------------------------------------------------------------

    def merge(self, other: "DoublesSketch") -> "DoublesSketch":
        """mergeInto semantics (quantiles/DoublesMergeImpl.java:60-126):
        other is the source, self the target; source k must be target k
        times a power of 2 (down-sampled by zip-with-stride)."""
        if other.is_empty():
            return self
        if other.k % self.k != 0 or (other.k // self.k) & (other.k // self.k - 1):
            raise SketchesArgumentError(
                "source k must equal target k * 2^(nonnegative integer)"
            )
        lg_down = (other.k // self.k).bit_length() - 1
        n_final = self.n + other.n
        if len(other._bb):
            self.update_many(other._bb)
        for lvl in sorted(other._levels):
            src = np.sort(other._levels[lvl])
            if lg_down:
                stride = 1 << lg_down
                offset = int(self._rng.integers(stride))
                src = src[offset::stride][: self.k].copy()
            self._carry_in(src, lvl + lg_down)
        self.n = n_final
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        return self

    # -- queries -----------------------------------------------------------

    def _sorted_view(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted items, cumulative weights) per DoublesSketchSortedView."""
        items = [self._bb] if len(self._bb) else []
        weights = [np.ones(len(self._bb), dtype=np.int64)] if len(self._bb) else []
        for lvl, arr in self._levels.items():
            items.append(arr)
            weights.append(np.full(len(arr), 1 << (lvl + 1), dtype=np.int64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], np.cumsum(wt[order])

    def quantile(self, rank: float, inclusive: bool = True) -> float:
        if self.is_empty():
            return math.nan
        if not 0.0 <= rank <= 1.0:
            raise SketchesArgumentError(f"rank must be in [0,1]: {rank}")
        # rank 0/1 return the tracked exact extremes (the reference's
        # quantile API contract) — in estimation mode the random zip can
        # drop the global min/max from the retained levels
        if rank <= 0.0:
            return self._min
        if rank >= 1.0:
            return self._max
        items, cum = self._sorted_view()
        if inclusive:
            natural = int(math.ceil(rank * self.n))
            idx = int(np.searchsorted(cum, natural, side="left"))  # first >= natural
        else:
            natural = int(math.floor(rank * self.n))
            idx = int(np.searchsorted(cum, natural, side="right"))  # first > natural
        if idx >= len(items):
            return float(items[-1])
        return float(items[idx])

    def quantiles(self, ranks: list[float], inclusive: bool = True) -> list[float]:
        return [self.quantile(r, inclusive) for r in ranks]

    def rank(self, value: float, inclusive: bool = True) -> float:
        if self.is_empty():
            return math.nan
        items, cum = self._sorted_view()
        side = "right" if inclusive else "left"
        idx = int(np.searchsorted(items, value, side=side))
        if idx == 0:
            return 0.0
        return float(cum[idx - 1]) / self.n

    # -- serde (reference wire format) -------------------------------------

    def serialize(self) -> bytes:
        """SerVer-3 compact ordered image (quantiles/PreambleUtil.java:41-75,
        quantiles/DoublesByteArrayImpl.java)."""
        if self.is_empty():
            flags = _EMPTY_FLAG | _COMPACT_FLAG | _READ_ONLY_FLAG | _ORDERED_FLAG
            return struct.pack("<BBBBHH", 1, _SER_VER, _FAMILY_QUANTILES, flags, self.k, 0)
        flags = _COMPACT_FLAG | _READ_ONLY_FLAG | _ORDERED_FLAG
        out = [
            struct.pack("<BBBBHH", 2, _SER_VER, _FAMILY_QUANTILES, flags, self.k, 0),
            struct.pack("<q", self.n),
            struct.pack("<dd", self._min, self._max),
            np.sort(self._bb).astype("<f8").tobytes(),
        ]
        for lvl in sorted(self._levels):
            out.append(np.sort(self._levels[lvl]).astype("<f8").tobytes())
        return b"".join(out)

    @classmethod
    def deserialize(cls, raw: bytes, seed: int = 0) -> "DoublesSketch":
        """Heapify a reference DoublesSketch image: SerVer 1 (non-compact,
        5 pre-longs), SerVer 2 (compact) or SerVer 3 (flag-selected), per
        quantiles/HeapUpdateDoublesSketch.java:124-163,276-319."""
        if len(raw) < 8:
            raise SketchesArgumentError(f"source too small: {len(raw)} < 8")
        _pre_longs, ser_ver, family, flags, k = struct.unpack_from("<BBBBH", raw, 0)
        if family != _FAMILY_QUANTILES:
            raise SketchesArgumentError(f"not a quantiles family image: {family}")
        if not 1 <= ser_ver <= 3:
            raise SketchesArgumentError(f"unsupported SerVer: {ser_ver}")
        if flags & _BIG_ENDIAN_FLAG:
            raise SketchesArgumentError("big-endian images not supported")
        sk = cls(k, seed=seed)
        if flags & _EMPTY_FLAG:
            return sk
        (n,) = struct.unpack_from("<q", raw, 8)
        sk._min, sk._max = struct.unpack_from("<dd", raw, 16)
        # SerVer 1 carried an extra buffer-allocation long before the data
        # (quantiles/HeapUpdateDoublesSketch.java:283).
        data_off = 40 if ser_ver == 1 else 32
        src_compact = ser_ver == 2 or bool(flags & _COMPACT_FLAG)
        two_k = 2 * k
        bb_count = int(n % two_k)
        bit_pattern = n // two_k
        data = np.frombuffer(raw, dtype="<f8", offset=data_off).astype(np.float64)
        if src_compact:
            sk._bb = data[:bb_count].copy()
            pos = bb_count
            lvl = 0
            bp = bit_pattern
            while bp:
                if bp & 1:
                    sk._levels[lvl] = data[pos : pos + k].copy()
                    pos += k
                lvl += 1
                bp >>= 1
        else:
            sk._bb = data[:bb_count].copy()
            lvl = 0
            bp = bit_pattern
            while bp:
                if bp & 1:
                    start = (2 + lvl) * k
                    sk._levels[lvl] = data[start : start + k].copy()
                lvl += 1
                bp >>= 1
        sk.n = int(n)
        return sk
