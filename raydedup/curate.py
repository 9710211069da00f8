"""Corpus-curation operators: per-key document caps.

``cap_per_key`` keeps at most ``k`` rows per key (the "at most N documents
per domain/repo" rule of web-corpus curation), preferring the smallest
``order_col`` — deterministic when (key, order_col) is unique, which a
unique doc id guarantees.

Scale shape: one hash-partition shuffle that co-locates equal keys into
~2×CPU partition groups (pipeline.grouped_blocks — one Python call per
PARTITION, never per key), then a single lexsort + run-boundary rank filter
per partition. Equivalent SQL: ``row_number() OVER (PARTITION BY key ORDER
BY order_col) <= k`` — the oracle in __ray_entry__ mirrors it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def cap_per_key(
    ds: "ray.data.Dataset",  # noqa: F821 - forward ref; ray imported lazily
    key: str,
    order_col: str,
    k: int,
) -> "ray.data.Dataset":  # noqa: F821
    """Keep the ``k`` smallest-``order_col`` rows of every ``key`` group."""
    if k <= 0:
        raise ValueError("k must be positive")
    from .pipeline import grouped_blocks, key_codes

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        kc = key_codes(b.column(key))
        oc = key_codes(b.column(order_col))
        order = np.lexsort((oc, kc))
        kk = kc[order]
        idx = np.arange(len(kk))
        new_run = np.concatenate([[True], kk[1:] != kk[:-1]])
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        keep = order[(idx - run_start) < k]
        keep.sort()  # preserve the block's row order among survivors
        return b.take(pa.array(keep, pa.int64()))

    return grouped_blocks(ds, key, block)
