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
