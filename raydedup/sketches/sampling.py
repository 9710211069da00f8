"""Sampling sketches: uniform reservoir + weighted priority sampling.

* ``ReservoirSketch`` — engine analog of sampling/ReservoirItemsSketch.java:
  59-379 (algorithm R) with the union's lightweight merge semantics
  (ReservoirItemsUnion.java:148-239: treat the smaller input's sample as a
  weighted pseudo-stream).
* ``PrioritySample`` — weighted sample with unbiased subset-sum estimates,
  standing in for sampling/VarOptItemsSketch.java:59-71 (VarOpt is
  variance-optimal; priority sampling — Duffield, Lund, Thorup 2007, public
  — is within a constant of optimal and exactly mergeable when priorities
  derive deterministically from item hashes). ``estimate_subset_sum``
  mirrors VarOptItemsSketch.estimateSubsetSum(:636-675) incl. the
  SampleSubsetSummary-style (lb, estimate, ub, total_weight) result.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from ..hashing import splitmix64


class ReservoirSketch:
    """Uniform k-reservoir over an unweighted stream."""

    def __init__(self, k: int, seed: int = 0):
        self.k = k
        self.n = 0
        self.samples: list[Any] = []
        self._rng = np.random.default_rng(seed + 0x5E5)

    def update(self, item: Any) -> None:
        self.n += 1
        if len(self.samples) < self.k:
            self.samples.append(item)
        else:
            j = int(self._rng.integers(self.n))
            if j < self.k:
                self.samples[j] = item

    def update_many(self, items: list[Any]) -> None:
        for it in items:
            self.update(it)

    def merge(self, other: "ReservoirSketch") -> "ReservoirSketch":
        # lightweight merge: stream other's samples, each standing for
        # other.n / len(other.samples) items (ReservoirItemsUnion semantics)
        if other.n == 0:
            return self
        if self.n == 0:
            self.n, self.samples = other.n, list(other.samples)
            return self
        implied = other.n / max(1, len(other.samples))
        total = self.n
        for it in other.samples:
            total += implied
            if len(self.samples) < self.k:
                self.samples.append(it)
            else:
                j = self._rng.random()
                if j < self.k / total:
                    self.samples[int(self._rng.integers(self.k))] = it
        self.n = int(round(total))
        return self


@dataclass
class SampleSubsetSummary:
    lower_bound: float
    estimate: float
    upper_bound: float
    total_sketch_weight: float


class PrioritySample:
    """Mergeable weighted sample of (key:int64, weight:float64) items.

    Priority q_i = w_i / u_i with u_i = uniform(0,1] derived from
    splitmix64(key) — deterministic, so duplicate observations of a key and
    merges of overlapping partitions stay consistent. Keep top-k priorities;
    threshold tau = (k+1)-th priority. Subset-sum estimator:
    sum over sampled i in subset of max(w_i, tau) — unbiased (DLT 2007).
    """

    def __init__(self, k: int, seed: int = 0):
        self.k = k
        self.seed = seed
        self.keys = np.zeros(0, dtype=np.int64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.priorities = np.zeros(0, dtype=np.float64)
        self.tau = 0.0
        self.total_weight = 0.0
        self.total_count = 0

    def _u(self, keys: np.ndarray) -> np.ndarray:
        h = splitmix64(keys.view(np.uint64) ^ np.uint64(self.seed))
        return (h.astype(np.float64) + 1.0) / 2.0**64  # (0,1]

    def update_many(self, keys: np.ndarray, weights: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        weights = np.asarray(weights, dtype=np.float64)
        self.total_weight += float(weights.sum())
        self.total_count += len(keys)
        pri = weights / self._u(keys)
        self.keys = np.concatenate([self.keys, keys])
        self.weights = np.concatenate([self.weights, weights])
        self.priorities = np.concatenate([self.priorities, pri])
        self._trim()

    def _trim(self) -> None:
        if len(self.keys) <= self.k:
            return
        order = np.argsort(-self.priorities)
        keep = order[: self.k]
        self.tau = max(self.tau, float(self.priorities[order[self.k]]))
        self.keys = self.keys[keep]
        self.weights = self.weights[keep]
        self.priorities = self.priorities[keep]

    def merge(self, other: "PrioritySample") -> "PrioritySample":
        self.total_weight += other.total_weight
        self.total_count += other.total_count
        self.tau = max(self.tau, other.tau)
        self.keys = np.concatenate([self.keys, other.keys])
        self.weights = np.concatenate([self.weights, other.weights])
        self.priorities = np.concatenate([self.priorities, other.priorities])
        # drop duplicates (same key sampled in two partitions): priorities
        # are deterministic per key, so duplicates are exact repeats
        _, idx = np.unique(self.keys, return_index=True)
        self.keys = self.keys[idx]
        self.weights = self.weights[idx]
        self.priorities = self.priorities[idx]
        # items with priority <= merged tau are no longer a valid priority
        # sample at the merged threshold: they would be counted as included
        # w.p. 1 while actually sub-threshold, biasing subset sums upward
        if self.tau > 0.0:
            keep = self.priorities > self.tau
            self.keys = self.keys[keep]
            self.weights = self.weights[keep]
            self.priorities = self.priorities[keep]
        self._trim()
        return self

    def estimate_subset_sum(
        self, predicate: Callable[[np.ndarray], np.ndarray]
    ) -> SampleSubsetSummary:
        if len(self.keys) == 0:
            return SampleSubsetSummary(0.0, 0.0, 0.0, self.total_weight)
        mask = predicate(self.keys)
        adj = np.maximum(self.weights, self.tau)
        est = float(adj[mask].sum())
        # normal-approx bounds on the HT estimator (documented approximation)
        var = float((adj[mask] * np.maximum(self.tau - 0.0, 0.0)).sum())
        sd = math.sqrt(max(var, 0.0))
        return SampleSubsetSummary(
            max(0.0, est - 2 * sd),
            est,
            min(self.total_weight, est + 2 * sd),
            self.total_weight,
        )
