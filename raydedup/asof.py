"""As-of (temporal) join: for every left row, the latest right row with
right.on <= left.on within the same `by` key — the attribution / point-in-
time-lookup join Ray Data lacks as a primitive (the reference library has
no joins at all; this is engine-native dataflow, oracle-matched against
DuckDB's native ASOF JOIN).

Scale shape: tag each side, union the two streams, ONE hash-partition
shuffle on the `by` key (grouped_blocks), then a single lexsort +
vectorized forward-fill per partition block. Neither side is broadcast or
driver-materialized, so both sides stream at corpus scale; only the key's
rows must co-partition.

Determinism contract: when several right rows share (by, on) the one with
the greatest tie-break id wins (callers should pre-dedupe if ids are not
comparable); at on-equality the right row is visible to the left row
(<= semantics, matching ASOF JOIN).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pipeline import grouped_blocks, key_codes


def _asof_block(by: str, on: str, left_id: str, right_id: str, value_col: str | None):
    def f(block: pa.Table) -> pa.Table:
        n = len(block)
        # empty-block schema mirrors the input: `by` keeps its real arrow
        # type (string keys included), ids are the documented int64
        out_cols = {
            left_id: pa.array([], pa.int64()),
            by: pa.array([], block.schema.field(by).type),
            f"matched_{right_id}": pa.array([], pa.int64()),
        }
        if value_col:
            out_cols[f"matched_{value_col}"] = pa.array([], pa.float64())
        if n == 0:
            return pa.table(out_cols)
        by_col = block.column(by)
        keys = key_codes(by_col)  # string keys factorize to int codes
        on_v = block.column(on).to_numpy(zero_copy_only=False)
        if np.issubdtype(on_v.dtype, np.datetime64):
            on_v = on_v.astype("datetime64[us]").view(np.int64)
        else:
            on_v = on_v.astype(np.int64)
        side = block.column("__side").to_numpy()  # 0 = right, 1 = left
        ids = block.column("__id").to_numpy()
        vals = (
            block.column("__val").to_numpy(zero_copy_only=False)
            if value_col
            else None
        )
        # sort so that at equal (key, on) all right rows precede left rows
        # and the greatest-id right row is the last seen (tie-break winner)
        order = np.lexsort((ids, side, on_v, keys))
        keys, on_v, side, ids = keys[order], on_v[order], side[order], ids[order]
        if vals is not None:
            vals = vals[order]
        # forward-fill the most recent right-row position
        pos = np.maximum.accumulate(np.where(side == 0, np.arange(n), -1))
        is_left = side == 1
        lpos = pos[is_left]
        valid = (lpos >= 0) & (keys[np.maximum(lpos, 0)] == keys[is_left])
        matched = np.where(valid, ids[np.maximum(lpos, 0)], 0)
        sorted_by = (
            by_col.combine_chunks() if isinstance(by_col, pa.ChunkedArray) else by_col
        ).take(pa.array(order[is_left]))  # original dtype, left rows only
        out = {
            left_id: pa.array(ids[is_left]),
            by: sorted_by,
            f"matched_{right_id}": pa.array(
                np.ma.masked_array(matched, mask=~valid).astype(np.int64),
                type=pa.int64(),
                from_pandas=True,
            ),
        }
        if vals is not None:
            mv = np.where(valid, vals[np.maximum(lpos, 0)], np.nan)
            out[f"matched_{value_col}"] = pa.array(
                np.ma.masked_array(mv, mask=~valid), type=pa.float64(), from_pandas=True
            )
        return pa.table(out)

    return f


def asof_join(
    left: "object",
    right: "object",
    by: str,
    on: str,
    left_id: str,
    right_id: str,
    value_col: str | None = None,
) -> "object":
    """left, right: Datasets. Returns (left_id, by, matched_<right_id>
    [, matched_<value_col>]) for every left row; matched columns are NULL
    when no right row precedes the left row within its key."""

    def tag(side_flag: int, id_col: str):
        def t(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {
                by: batch.column(by),
                on: batch.column(on),
                "__side": pa.array(np.full(n, side_flag, dtype=np.int8)),
                "__id": batch.column(id_col).cast(pa.int64()),
            }
            if value_col:
                cols["__val"] = (
                    batch.column(value_col).cast(pa.float64())
                    if side_flag == 0
                    else pa.array(np.full(n, np.nan))
                )
            return pa.table(cols)

        return t

    lcols = [by, on, left_id]
    rcols = [by, on, right_id] + ([value_col] if value_col else [])
    tagged = left.select_columns(lcols).map_batches(
        tag(1, left_id), batch_format="pyarrow"
    ).union(
        right.select_columns(rcols).map_batches(tag(0, right_id), batch_format="pyarrow")
    )
    return grouped_blocks(
        tagged, by, _asof_block(by, on, left_id, right_id, value_col)
    )
