"""Sampling sketches: uniform reservoir + weighted priority sampling.

* ``ReservoirSketch`` — engine analog of sampling/ReservoirItemsSketch.java:
  59-379 (algorithm R) with the union's lightweight merge semantics
  (ReservoirItemsUnion.java:148-239: treat the smaller input's sample as a
  weighted pseudo-stream).
* ``VarOptItemsSketch`` — faithful variance-optimal weighted sampling
  (sampling/VarOptItemsSketch.java:59-71): exact heavy region + shared-tau
  reservoir, per-item updates.
* ``PrioritySample`` — vectorized weighted sample with unbiased subset-sum
  estimates (priority sampling — Duffield, Lund, Thorup 2007 — is within a
  constant of variance-optimal and exactly mergeable when priorities derive
  deterministically from item hashes); the batch-throughput path.
  ``estimate_subset_sum`` on both mirrors
  VarOptItemsSketch.estimateSubsetSum(:636-675) incl. the
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
        # implied = other.n / len(other.samples) items (ReservoirItemsUnion
        # pseudo-stream semantics) — acceptance must be k*implied/total or
        # the merged reservoir is biased toward self by a factor of implied
        if other.n == 0:
            return self
        if self.n == 0:
            self.n = other.n
            if len(other.samples) <= self.k:
                self.samples = list(other.samples)
            else:
                # adopting a larger-k sample: subsample uniformly to k —
                # oversized slots could never be replaced by update()
                idx = self._rng.choice(len(other.samples), size=self.k, replace=False)
                self.samples = [other.samples[i] for i in idx]
            return self
        implied = other.n / max(1, len(other.samples))
        total = float(self.n)
        for it in other.samples:
            total += implied
            if len(self.samples) < self.k:
                self.samples.append(it)
            elif self._rng.random() < min(1.0, self.k * implied / total):
                self.samples[int(self._rng.integers(self.k))] = it
        self.n = int(round(total))
        return self


@dataclass
class SampleSubsetSummary:
    lower_bound: float
    estimate: float
    upper_bound: float
    total_sketch_weight: float


class VarOptItemsSketch:
    """Variance-optimal weighted sample of k items (Cohen, Duffield, Kaplan,
    Lund, Thorup — "Stream sampling for variance-optimal estimation of
    subset sums", 2011). Engine analog of sampling/VarOptItemsSketch.java:
    59-71 with the same H (exact heavy) / R (shared-tau reservoir) regions,
    warmup transition, candidate-set growth and systematic delete-slot
    selection (VarOptItemsSketch.java:822-1243 structure, written from the
    paper's algorithm).

    Subset-sum estimates are unbiased and variance-optimal: heavy items
    keep exact weights, light items carry adjusted weight
    tau = total_wt_r / r. Union folds another sketch in as a pseudo-stream
    of (item, adjusted weight) updates — adjusted weights are themselves
    unbiased per-item weight estimates, so subset sums stay unbiased (the
    lightweight merge, mirroring ReservoirItemsUnion's approach).
    """

    def __init__(self, k: int, seed: int = 0):
        self.k = k
        self.n = 0
        self.total_weight = 0.0
        self._heap: list[tuple[float, int, Any]] = []  # H: (weight, tie, key)
        self.r_items: list[Any] = []
        self.total_wt_r = 0.0
        self._rng = np.random.default_rng(seed ^ 0xA0C7)
        self._tie = 0

    # -- region views -------------------------------------------------------

    @property
    def h(self) -> int:
        return len(self._heap)

    @property
    def r(self) -> int:
        return len(self.r_items)

    @property
    def num_samples(self) -> int:
        return self.h + self.r

    def tau(self) -> float:
        return self.total_wt_r / self.r if self.r else 0.0

    def samples(self) -> list[tuple[Any, float]]:
        """(item, adjusted weight) pairs: H exact, R at tau."""
        t = self.tau()
        return [(key, w) for w, _, key in self._heap] + [
            (key, t) for key in self.r_items
        ]

    # -- update -------------------------------------------------------------

    def _u_excl0(self) -> float:
        u = float(self._rng.random())
        return u if u > 0.0 else 5e-324

    def update(self, key: Any, weight: float) -> None:
        import heapq

        if weight <= 0.0:
            raise ValueError(f"weights must be strictly positive: {weight}")
        self.n += 1
        self.total_weight += weight
        self._tie += 1
        if self.r == 0:
            # warmup / exact mode
            heapq.heappush(self._heap, (weight, self._tie, key))
            if self.h == self.k + 1:
                # transition: the two lightest items form the first valid
                # candidate set (any two items downsample to one)
                w1, _, k1 = heapq.heappop(self._heap)  # lightest → R
                self.r_items = [k1]
                self.total_wt_r = w1
                w2, _, k2 = heapq.heappop(self._heap)  # next → M
                self._grow_candidates([(w2, k2)], w2 + self.total_wt_r, 2)
            return
        # estimation mode
        hyp_tau = (weight + self.total_wt_r) / self.r  # (r+1)-1 slots
        cond1 = self.h == 0 or weight <= self._heap[0][0]
        cond2 = weight < hyp_tau
        if cond1 and cond2:
            # light: new item is the single M candidate
            self._grow_candidates(
                [(weight, key)], self.total_wt_r + weight, self.r + 1
            )
        elif self.r == 1:
            heapq.heappush(self._heap, (weight, self._tie, key))
            w2, _, k2 = heapq.heappop(self._heap)
            self._grow_candidates([(w2, k2)], w2 + self.total_wt_r, 2)
        else:
            heapq.heappush(self._heap, (weight, self._tie, key))
            self._grow_candidates([], self.total_wt_r, self.r)

    def _grow_candidates(
        self, m_items: list[tuple[float, Any]], wt_cands: float, num_cands: int
    ) -> None:
        import heapq

        # pull strictly-light heap minima into the candidate (M) set
        while self._heap:
            next_wt = self._heap[0][0]
            if next_wt * num_cands < wt_cands + next_wt:
                wt_cands += next_wt
                num_cands += 1
                w, _, kk = heapq.heappop(self._heap)
                m_items.append((w, kk))
            else:
                break
        self._downsample(m_items, wt_cands, num_cands)

    def _downsample(
        self, m_items: list[tuple[float, Any]], wt_cands: float, num_cands: int
    ) -> None:
        """Drop exactly one of the num_cands candidates (M ∪ R); survivors
        become the new R with shared total weight wt_cands."""
        num_to_keep = num_cands - 1
        m = len(m_items)
        if m == 0:
            i = int(self._rng.integers(self.r))
            self.r_items[i] = self.r_items[-1]
            self.r_items.pop()
        elif m == 1:
            wt_m = m_items[0][0]
            if wt_cands * self._u_excl0() < num_to_keep * wt_m:
                # keep the M item, delete a random R slot
                i = int(self._rng.integers(self.r))
                self.r_items[i] = m_items[0][1]
            else:
                pass  # delete the M item: R unchanged
        else:
            # systematic selection, scanning M heaviest-first (slot order of
            # the reference's M region)
            left = 0.0
            right = -wt_cands * self._u_excl0()
            delete_idx: int | None = None
            ordered = sorted(m_items, key=lambda t: -t[0])
            for i, (w, _) in enumerate(ordered):
                left += num_to_keep * w
                right += wt_cands
                if left < right:
                    delete_idx = i
                    break
            if delete_idx is None:
                # delete out of R, keep all M items
                j = int(self._rng.integers(self.r))
                self.r_items[j] = self.r_items[-1]
                self.r_items.pop()
                self.r_items.extend(kk for _, kk in ordered)
            else:
                self.r_items.extend(
                    kk for i, (_, kk) in enumerate(ordered) if i != delete_idx
                )
        self.total_wt_r = wt_cands

    def update_many(self, keys, weights) -> None:
        for kk, ww in zip(list(keys), np.asarray(weights, dtype=np.float64)):
            self.update(kk, float(ww))

    # -- merge --------------------------------------------------------------

    def merge(self, other: "VarOptItemsSketch") -> "VarOptItemsSketch":
        """Pseudo-stream union: re-insert other's samples at their adjusted
        weights (unbiased); n and total_weight accumulate exactly."""
        n_before, tw_before = self.n, self.total_weight
        for key, w in other.samples():
            if w > 0.0:
                self.update(key, w)
        self.n = n_before + other.n
        self.total_weight = tw_before + other.total_weight
        return self

    # -- estimation ---------------------------------------------------------

    def estimate_subset_sum(self, predicate) -> "SampleSubsetSummary":
        """Unbiased subset-sum estimate with bounds
        (VarOptItemsSketch.estimateSubsetSum:636-675 semantics)."""
        if self.n == 0:
            return SampleSubsetSummary(0.0, 0.0, 0.0, 0.0)
        t = self.tau()
        h_sum = 0.0
        r_hits = 0
        for w, _, key in self._heap:
            if predicate(key):
                h_sum += w
        for key in self.r_items:
            if predicate(key):
                r_hits += 1
        est = h_sum + r_hits * t
        if self.r == 0 or r_hits == 0:
            return SampleSubsetSummary(h_sum, est, est, self.total_weight)
        # binomial-style spread on the sampled region (reference returns
        # pseudo-exact intervals from the marked-subset weight fractions)
        frac = r_hits / self.r
        sd = t * math.sqrt(self.r * frac * (1.0 - frac))
        return SampleSubsetSummary(
            max(h_sum, est - 2 * sd),
            est,
            min(self.total_weight, est + 2 * sd),
            self.total_weight,
        )


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
        # dedupe repeated key observations the same way merge does, so the
        # retained sample is independent of how observations were split
        # across blocks/partitions (total_weight stays observation-summed
        # on both paths)
        _, idx = np.unique(self.keys, return_index=True)
        if len(idx) != len(self.keys):
            self.keys = self.keys[idx]
            self.weights = self.weights[idx]
            self.priorities = self.priorities[idx]
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
        # normal-approx bounds on the HT estimator (documented
        # approximation): per-item variance term tau*(tau - w_i)+ — zero
        # for heavy items (included with probability 1)
        var = float(
            (adj[mask] * np.maximum(self.tau - self.weights[mask], 0.0)).sum()
        )
        sd = math.sqrt(max(var, 0.0))
        return SampleSubsetSummary(
            max(0.0, est - 2 * sd),
            est,
            min(self.total_weight, est + 2 * sd),
            self.total_weight,
        )
