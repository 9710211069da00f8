"""Sessionization: per-key session assignment with an inactivity-gap rule —
the classic stateful-per-key windowed operator (the reference library has no
windowing at all, SURVEY §2.10; this is engine-native dataflow).

Scale shape: ONE hash-partition shuffle on the user key (grouped_blocks —
~2×CPU python calls total, not one per user), then a single lexsort +
vectorized gap scan per partition block. No per-user Python, no driver
materialization; works for billions of users because a user's events only
need to be co-partitioned, never co-resident with other users' state.

Determinism contract (what makes it SQL-oracle-able): events are ordered by
(user, ts, event_id) — event_id breaks timestamp ties — and a new session
starts when the gap since the previous event of the same user EXCEEDS
``gap`` (strictly greater, in the timestamp's native unit). session_id is
the event_id of the session's first event.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pipeline import grouped_blocks, key_codes


def _take_sorted(col, order: np.ndarray):
    """Original-dtype column values in sorted order (string keys included)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.take(pa.array(order))


def _session_block(user_col: str, ts_col: str, id_col: str, gap_us: int):
    def f(block: pa.Table) -> pa.Table:
        n = len(block)
        if n == 0:
            # empty-block schema mirrors the input's real key type
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    user_col: pa.array([], block.schema.field(user_col).type),
                    "session_id": pa.array([], pa.int64()),
                }
            )
        user_arr = block.column(user_col)
        users = key_codes(user_arr)  # string keys factorize to int codes
        ts = block.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts_us = ts.view(np.int64)
        ids = block.column(id_col).to_numpy()
        order = np.lexsort((ids, ts_us, users))
        users, ts_us, ids = users[order], ts_us[order], ids[order]
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            same_user = users[1:] == users[:-1]
            within_gap = (ts_us[1:] - ts_us[:-1]) <= gap_us
            new_sess[1:] = ~(same_user & within_gap)
        # session start index for every row: forward-fill start positions
        start_pos = np.maximum.accumulate(np.where(new_sess, np.arange(n), -1))
        session_id = ids[start_pos]
        return pa.table(
            {
                id_col: pa.array(ids),
                user_col: _take_sorted(user_arr, order),
                "session_id": pa.array(session_id),
            }
        )

    return f


def sessionize(
    events: "object",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
) -> "object":
    """events Dataset → (id_col, user_col, session_id) for every event."""
    ds = events.select_columns([id_col, user_col, ts_col])
    return grouped_blocks(
        ds, user_col, _session_block(user_col, ts_col, id_col, gap_s * 1_000_000)
    )


def _window_count_block(user_col: str, ts_col: str, id_col: str, gap_us: int):
    def f(block: pa.Table) -> pa.Table:
        n = len(block)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    user_col: pa.array([], block.schema.field(user_col).type),
                    "n_window": pa.array([], pa.int64()),
                }
            )
        user_arr = block.column(user_col)
        users = key_codes(user_arr)  # string keys factorize to int codes
        ts = block.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts_us = ts.view(np.int64)
        ids = block.column(id_col).to_numpy()
        order = np.lexsort((ids, ts_us, users))
        users, ts_us, ids = users[order], ts_us[order], ids[order]
        # make timestamps globally monotonic while (a) preserving intra-user
        # differences exactly and (b) separating users by > gap, so ONE
        # searchsorted pair answers every row's range query without any
        # per-user python. Offsets are exact in int64 for any realistic
        # partition (sum of user ts-spans + n_users*gap << 2^63).
        seg_start = np.concatenate([[True], users[1:] != users[:-1]])
        starts = np.flatnonzero(seg_start)
        ends = np.concatenate([starts[1:], [n]])
        spans = ts_us[ends - 1] - ts_us[starts]
        base = np.zeros(len(starts), dtype=np.int64)
        if len(starts) > 1:
            base[1:] = np.cumsum(spans[:-1] + gap_us + 1)
        seg_id = np.cumsum(seg_start) - 1
        adj = ts_us - ts_us[starts][seg_id] + base[seg_id]
        lo = np.searchsorted(adj, adj - gap_us, side="left")
        hi = np.searchsorted(adj, adj, side="right")
        return pa.table(
            {
                id_col: pa.array(ids),
                user_col: _take_sorted(user_arr, order),
                "n_window": pa.array((hi - lo).astype(np.int64)),
            }
        )

    return f


def sliding_window_count(
    events: "object",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_s: int = 300,
) -> "object":
    """Per-event trailing-window event count: for every event, the number
    of events of the same key with ts in [ts - window, ts] — RANGE-frame
    semantics (all timestamp peers included), a range self-join expressed
    as one hash-partition shuffle + two vectorized searchsorted passes."""
    ds = events.select_columns([id_col, user_col, ts_col])
    return grouped_blocks(
        ds, user_col, _window_count_block(user_col, ts_col, id_col, window_s * 1_000_000)
    )
