"""Tuple sketch: theta-style KMV retention with a typed summary per hash.

Engine analog of tuple/UpdatableSketch.java:100-157 + arrayofdoubles
(tuple/arrayofdoubles/ArrayOfDoublesSketch.java:30-35): each retained hash
carries a float64 summary vector; set operations combine summaries with a
user mode (sum/min/max/always_one/increment —
tuple/adouble/DoubleSummary.java:31-60, increment per
tuple/aninteger/IntegerSummary.java Mode.Increment). Vectorized over numpy
columns; the Arrow layout is (hashes: uint64[], values: float64[n,
num_values]).

Also here: tuple-level JaccardSimilarity (tuple/JaccardSimilarity.java) and
ArrayOfStringsSketch (tuple/strings/ArrayOfStringsSketch.java) whose
summaries are string tuples combined by set union — the summary type fdt
builds on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bounds import ratio_bounds_lb, ratio_bounds_ub
from ..kmv import MAX_THETA

MODES = ("sum", "min", "max", "always_one", "increment")


def _combine(mode: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if mode == "sum":
        return a + b
    if mode == "min":
        return np.minimum(a, b)
    if mode == "max":
        return np.maximum(a, b)
    if mode == "always_one":
        return np.ones_like(a)
    if mode == "increment":
        # IntegerSummary Mode.Increment: each further observation of the key
        # adds exactly 1, whatever value it carried
        return a + 1.0
    raise ValueError(mode)


@dataclass
class TupleSketch:
    theta: np.uint64
    hashes: np.ndarray            # sorted distinct uint64 < theta
    values: np.ndarray            # (len(hashes), num_values) float64
    k: int
    mode: str = "sum"

    @staticmethod
    def empty(k: int, num_values: int = 1, mode: str = "sum") -> "TupleSketch":
        return TupleSketch(
            MAX_THETA, np.zeros(0, dtype=np.uint64),
            np.zeros((0, num_values), dtype=np.float64), k, mode,
        )

    def estimate(self) -> float:
        if self.theta == MAX_THETA:
            return float(len(self.hashes))
        return len(self.hashes) * (float(MAX_THETA) / float(self.theta))

    def update_many(self, theta_hashes: np.ndarray, values: np.ndarray) -> "TupleSketch":
        """Batch update: combine duplicate keys with the summary mode, then
        re-trim to k minimum hashes (UpdatableSketch insert semantics)."""
        h = np.asarray(theta_hashes, dtype=np.uint64)
        v = np.atleast_2d(np.asarray(values, dtype=np.float64))
        if v.shape[0] != len(h):
            v = v.T
        keep = (h != np.uint64(0)) & (h < self.theta)
        h, v = h[keep], v[keep]
        allh = np.concatenate([self.hashes, h])
        allv = np.concatenate([self.values, v]) if len(v) else self.values
        return self._rebuild(allh, allv)

    def _rebuild(self, allh: np.ndarray, allv: np.ndarray) -> "TupleSketch":
        order = np.argsort(allh, kind="stable")
        sh, sv = allh[order], allv[order]
        # combine runs of equal hashes
        if len(sh):
            boundaries = np.concatenate([[True], sh[1:] != sh[:-1]])
            idx = np.flatnonzero(boundaries)
            outh = sh[idx]
            ends = np.concatenate([idx[1:], [len(sh)]])
            runlen = ends - idx
            # vectorized run combine (one reduceat / broadcast per block —
            # the per-duplicate python loop made tuple_distinct_sum's
            # accumulate O(rows) scalar work)
            if self.mode == "sum":
                outv = np.add.reduceat(sv, idx, axis=0)
            elif self.mode == "min":
                outv = np.minimum.reduceat(sv, idx, axis=0)
            elif self.mode == "max":
                outv = np.maximum.reduceat(sv, idx, axis=0)
            elif self.mode == "increment":
                # acc = first + 1 per further observation (_combine chain)
                outv = sv[idx] + (runlen - 1)[:, None].astype(np.float64)
            elif self.mode == "always_one":
                # singleton runs never enter _combine: they keep their value
                outv = np.where((runlen > 1)[:, None], 1.0, sv[idx])
            else:
                raise ValueError(self.mode)
        else:
            outh, outv = sh, sv
        theta = self.theta
        if len(outh) > self.k:
            theta = outh[self.k]
            outh, outv = outh[: self.k], outv[: self.k]
        return TupleSketch(np.uint64(theta), outh, outv, self.k, self.mode)

    def union(self, other: "TupleSketch") -> "TupleSketch":
        theta = np.uint64(min(self.theta, other.theta))
        allh = np.concatenate([self.hashes, other.hashes])
        allv = np.concatenate([self.values, other.values])
        keep = allh < theta
        res = TupleSketch(
            theta, np.zeros(0, np.uint64),
            np.zeros((0, self.values.shape[1]), np.float64), self.k, self.mode,
        )
        return res._rebuild(allh[keep], allv[keep])

    def intersect(self, other: "TupleSketch") -> "TupleSketch":
        theta = np.uint64(min(self.theta, other.theta))
        common, ia, ib = np.intersect1d(
            self.hashes, other.hashes, assume_unique=True, return_indices=True
        )
        keep = common < theta
        vals = _combine(self.mode, self.values[ia], other.values[ib])[keep]
        return TupleSketch(theta, common[keep], vals, max(self.k, other.k), self.mode)

    def a_not_b(self, other: "TupleSketch") -> "TupleSketch":
        theta = np.uint64(min(self.theta, other.theta))
        mask = ~np.isin(self.hashes, other.hashes, assume_unique=True)
        mask &= self.hashes < theta
        return TupleSketch(theta, self.hashes[mask], self.values[mask], self.k, self.mode)

    def filter(self, predicate) -> "TupleSketch":
        """Summary-predicate filter, theta preserved (tuple/Filter.java:51-74)."""
        mask = predicate(self.values)
        return TupleSketch(self.theta, self.hashes[mask], self.values[mask], self.k, self.mode)


def tuple_jaccard(a: TupleSketch, b: TupleSketch) -> tuple[float, float, float]:
    """{LB, estimate, UB} of J(A,B) over two tuple sketches' key sets —
    tuple/JaccardSimilarity.java semantics (summaries ignored; the hash
    sets drive the ratio, bounds per BoundsOnRatiosInTupleSketchedSets)."""
    # corner cases (tuple/JaccardSimilarity.java:66-69): both empty -> ONES
    # (two empty sets are identical), exactly one empty -> ZEROS
    a_empty = len(a.hashes) == 0 and a.theta == MAX_THETA
    b_empty = len(b.hashes) == 0 and b.theta == MAX_THETA
    if a_empty and b_empty:
        return (1.0, 1.0, 1.0)
    if a_empty or b_empty:
        return (0.0, 0.0, 0.0)
    if (
        a.theta == MAX_THETA
        and b.theta == MAX_THETA
        and len(a.hashes) == len(b.hashes)
        and np.array_equal(a.hashes, b.hashes)
    ):
        return (1.0, 1.0, 1.0)
    k = max(a.k, b.k)
    theta = np.uint64(min(a.theta, b.theta))
    merged = np.union1d(a.hashes, b.hashes)
    merged = merged[merged < theta]
    if len(merged) > k:
        theta = np.uint64(merged[k])
        merged = merged[:k]
    if len(merged) == 0:
        return (0.0, 0.0, 0.0)
    in_a = np.isin(merged, a.hashes, assume_unique=True)
    in_b = np.isin(merged, b.hashes, assume_unique=True)
    inter = int(np.count_nonzero(in_a & in_b))
    n_union = len(merged)
    theta_frac = float(theta) / float(MAX_THETA)
    return (
        ratio_bounds_lb(n_union, inter, theta_frac),
        inter / n_union,
        ratio_bounds_ub(n_union, inter, theta_frac),
    )


def tuple_exactly_equal(a: TupleSketch, b: TupleSketch) -> bool:
    """tuple/JaccardSimilarity.exactlyEqual analog: identical retained key
    sets of two exact-mode sketches."""
    return bool(
        a.theta == MAX_THETA
        and b.theta == MAX_THETA
        and len(a.hashes) == len(b.hashes)
        and np.array_equal(a.hashes, b.hashes)
    )


class ArrayOfStringsSketch:
    """Tuple sketch whose summary is a SET of strings per retained key
    (tuple/strings/ArrayOfStringsSketch.java): union combines summaries by
    set union — the summary type the reference's fdt package builds on.

    Retained state is bounded: <= k keys, each holding the distinct strings
    observed for that key (callers cap per-key sets via ``max_strings``)."""

    def __init__(self, k: int, max_strings: int = 0):
        self.k = k
        self.max_strings = max_strings  # 0 = unbounded
        self.theta = np.uint64(MAX_THETA)
        self.hashes = np.zeros(0, dtype=np.uint64)
        self.summaries: list[frozenset[str]] = []

    def update_many(self, theta_hashes: np.ndarray, strings: list[str]) -> None:
        h = np.asarray(theta_hashes, dtype=np.uint64)
        keep = (h != np.uint64(0)) & (h < self.theta)
        merged: dict[int, set[str]] = {
            int(hh): set(s) for hh, s in zip(self.hashes, self.summaries)
        }
        for hh, s in zip(h[keep].tolist(), [strings[i] for i in np.flatnonzero(keep)]):
            cur = merged.setdefault(hh, set())
            if not self.max_strings or len(cur) < self.max_strings:
                cur.add(s)
        self._rebuild(merged)

    def _rebuild(self, merged: dict[int, set[str]]) -> None:
        keys = np.array(sorted(merged), dtype=np.uint64)
        theta = self.theta
        if len(keys) > self.k:
            theta = np.uint64(keys[self.k])
            keys = keys[: self.k]
        self.theta = theta
        self.hashes = keys
        self.summaries = [frozenset(merged[int(kk)]) for kk in keys]

    def union(self, other: "ArrayOfStringsSketch") -> "ArrayOfStringsSketch":
        theta = np.uint64(min(self.theta, other.theta))
        merged: dict[int, set[str]] = {}
        for sk in (self, other):
            for hh, s in zip(sk.hashes.tolist(), sk.summaries):
                if hh < theta:
                    merged.setdefault(hh, set()).update(s)
        out = ArrayOfStringsSketch(self.k, self.max_strings)
        out.theta = theta
        out._rebuild(merged)
        return out

    def estimate(self) -> float:
        if self.theta == MAX_THETA:
            return float(len(self.hashes))
        return len(self.hashes) * (float(MAX_THETA) / float(self.theta))

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps(
            (self.k, self.max_strings, int(self.theta), self.hashes, self.summaries)
        )

    @staticmethod
    def deserialize(buf: bytes) -> "ArrayOfStringsSketch":
        import pickle

        k, ms, theta, hashes, summaries = pickle.loads(buf)
        sk = ArrayOfStringsSketch(k, ms)
        sk.theta = np.uint64(theta)
        sk.hashes = hashes
        sk.summaries = summaries
        return sk
