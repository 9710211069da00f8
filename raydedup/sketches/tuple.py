"""Tuple sketch: theta-style KMV retention with a typed summary per hash.

Engine analog of tuple/UpdatableSketch.java:100-157 + arrayofdoubles
(tuple/arrayofdoubles/ArrayOfDoublesSketch.java:30-35): each retained hash
carries a float64 summary vector; set operations combine summaries with a
user mode (sum/min/max/always_one — tuple/adouble/DoubleSummary.java:31-60).
Vectorized over numpy columns; the Arrow layout is (hashes: uint64[],
values: float64[n, num_values]).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..kmv import MAX_THETA

MODES = ("sum", "min", "max", "always_one")


def _combine(mode: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if mode == "sum":
        return a + b
    if mode == "min":
        return np.minimum(a, b)
    if mode == "max":
        return np.maximum(a, b)
    if mode == "always_one":
        return np.ones_like(a)
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
            outv = np.empty((len(idx), sv.shape[1]), dtype=np.float64)
            ends = np.concatenate([idx[1:], [len(sh)]])
            for j, (s, e) in enumerate(zip(idx, ends)):
                seg = sv[s:e]
                acc = seg[0]
                for r in range(1, len(seg)):
                    acc = _combine(self.mode, acc, seg[r])
                outv[j] = acc
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
