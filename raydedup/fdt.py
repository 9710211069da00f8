"""Frequent Distinct Tuples — grouped distinct-count top-k (fdt package).

Engine analog of fdt/FdtSketch.java:49-142 + fdt/Group.java:100-108: for a
dataset of tuples, rank combinations of the *primary* dimensions by the
estimated number of distinct values of the *secondary* dimensions, with
lower/upper bounds and RSE per group. Expressed Ray-Data-first as
groupby(primary) → theta-distinct aggregate → bound columns → sort desc →
limit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .aggregates import theta_distinct
from .bounds import theta_rse
from .kmv import KmvSketch


def _sketch_agg(col: str, k: int, seed: int):
    """theta_distinct variant that finalizes to the serialized sketch so we
    can compute bounds per group."""
    from ray.data.aggregate import AggregateFn

    base = theta_distinct(col, k=k, seed=seed, name="_tmp")
    return AggregateFn(
        init=base.init,
        merge=base.merge,
        accumulate_block=base.accumulate_block,
        finalize=lambda s: s,
        name="sketch",
    )


def frequent_distinct_tuples(
    ds: "ray.data.Dataset",
    primary_cols: list[str],
    secondary_col: str,
    k: int = 4096,
    seed: int = 9001,
    limit: int = 20,
    num_std_dev: int = 2,
) -> "ray.data.Dataset":
    """→ Dataset(primary…, distinct_est, lb, ub, rse) top-`limit` groups by
    estimated distinct count of ``secondary_col`` (FdtSketch.getResult
    semantics: groups ranked by estimate with UB/LB at num_std_dev)."""
    agg = ds.groupby(primary_cols).aggregate(_sketch_agg(secondary_col, k, seed))

    def finish(batch: pa.Table) -> pa.Table:
        blobs = batch.column("sketch").to_pylist()
        est = np.empty(len(blobs))
        lb = np.empty(len(blobs))
        ub = np.empty(len(blobs))
        for i, b in enumerate(blobs):
            sk = KmvSketch.deserialize(b) if b else None
            if sk is None:
                est[i] = lb[i] = ub[i] = 0.0
                continue
            est[i] = sk.estimate()
            lb[i] = sk.lower_bound(num_std_dev)
            ub[i] = sk.upper_bound(num_std_dev)
        cols = {c: batch.column(c) for c in primary_cols}
        cols["distinct_est"] = pa.array(est)
        cols["lb"] = pa.array(lb)
        cols["ub"] = pa.array(ub)
        cols["rse"] = pa.array(np.full(len(blobs), theta_rse(k)))
        return pa.table(cols)

    out = agg.map_batches(finish, batch_format="pyarrow")
    return out.sort(
        ["distinct_est", *primary_cols], descending=[True] + [False] * len(primary_cols)
    ).limit(limit)


class FdtSketch:
    """Single-sketch Frequent Distinct Tuples — the reference's exact API
    shape (fdt/FdtSketch.java:49-142): one mergeable sketch over the whole
    stream built on ArrayOfStrings tuple summaries, where each update is a
    full tuple of strings and ``get_result(prim_indices)`` ranks primary-
    dimension combinations by the estimated number of distinct retained
    tuples (fdt/Group.java:100-108 ordering: count desc, key asc).

    The Ray-native path (``frequent_distinct_tuples``: groupby → theta
    aggregate) is the scale path; this class gives drop-in API parity for
    library users and small/driver-side use.
    """

    def __init__(self, lg_k: int = 12, seed: int = 9001):
        from .sketches.tuple import ArrayOfStringsSketch

        self.k = 1 << lg_k
        self.seed = seed
        self._sk = ArrayOfStringsSketch(self.k)
        # single-tuple updates buffer here and flush in batches: every
        # ArrayOfStringsSketch.update_many call rebuilds its retained table,
        # so per-tuple flushing would make driver-side builds quadratic
        self._buf_h: list[int] = []
        self._buf_s: list[str] = []

    def _flush(self) -> None:
        if self._buf_h:
            self._sk.update_many(
                np.array(self._buf_h, dtype=np.uint64), self._buf_s
            )
            self._buf_h, self._buf_s = [], []

    def update(self, tuple_values: list[str]) -> None:
        """Insert one string tuple (FdtSketch.update(String[])). Keys use
        the reference's exact chain (Util.stringArrHash →
        UpdatableSketch.update(long)), so serialized images carry keys a
        reference consumer would compute for the same tuples."""
        from .interop_aos import string_arr_key

        self._buf_h.append(string_arr_key(tuple_values))
        self._buf_s.append("\x00".join(tuple_values))
        if len(self._buf_h) >= 8192:
            self._flush()

    def merge(self, other: "FdtSketch") -> "FdtSketch":
        self._flush()
        other._flush()
        self._sk = self._sk.union(other._sk)
        return self

    def to_bytes(self) -> bytes:
        """Reference-format ArrayOfStringsSketch compact image (family 9)."""
        from .interop_aos import aos_tuple_to_bytes

        self._flush()
        return aos_tuple_to_bytes(self._sk, seed=self.seed)

    @classmethod
    def from_bytes(cls, raw: bytes, lg_k: int = 12, seed: int = 9001) -> "FdtSketch":
        from .interop_aos import aos_tuple_from_bytes

        out = cls(lg_k=lg_k, seed=seed)
        out._sk = aos_tuple_from_bytes(raw, k=out.k, seed=seed)
        return out

    def estimate(self) -> float:
        """Distinct tuple count estimate."""
        self._flush()
        return self._sk.estimate()

    def get_result(self, prim_indices: list[int], limit: int = 20) -> list[tuple]:
        """Rank primary-dim combinations by estimated distinct tuple count:
        [(primary_key_tuple, est_distinct), ...] desc (Group ordering)."""
        from collections import Counter

        self._flush()

        counts: Counter = Counter()
        for summ in self._sk.summaries:
            for packed in summ:
                parts = packed.split("\x00")
                key = tuple(parts[i] for i in prim_indices)
                counts[key] += 1
        scale = (
            1.0
            if int(self._sk.theta) == int(np.uint64(1) << np.uint64(63))
            else float(np.uint64(1) << np.uint64(63)) / float(self._sk.theta)
        )
        ranked = sorted(
            ((key, cnt * scale) for key, cnt in counts.items()),
            key=lambda t: (-t[1], t[0]),
        )
        return ranked[:limit]
