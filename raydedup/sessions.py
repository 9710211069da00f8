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

from .pipeline import grouped_blocks


def _session_block(user_col: str, ts_col: str, id_col: str, gap_us: int):
    def f(block: pa.Table) -> pa.Table:
        n = len(block)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                user_col: pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        users = block.column(user_col).to_numpy()
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
                user_col: pa.array(users),
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
