"""Sessionization: planted burst fixture (exact expected assignment,
boundary gap == vs > threshold) + engine-vs-DuckDB parity through the real
queries() callable."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_sessionize_planted(ray_session):
    import ray.data

    from raydedup.sessions import sessionize

    us = 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    # user 1: three events 10 min apart (one session), then one 31 min later
    # (new session). user 2: gap of EXACTLY 30 min (same session — rule is
    # strictly greater), then 30 min + 1 us (new session). user 3: ts tie —
    # event_id breaks it, both in one session.
    rows = [
        (0, 1, base),
        (1, 1, base + 600 * us),
        (2, 1, base + 1200 * us),
        (3, 1, base + 1200 * us + 1860 * us),  # +31min after event 2
        (4, 2, base),
        (5, 2, base + 1800 * us),            # == gap → same session
        (6, 2, base + 3600 * us + 1),        # prev +30min+1us → new
        (7, 3, base),
        (8, 3, base),                        # tie
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[2] for r in rows], dtype=np.int64).view("datetime64[us]")
            ),
        }
    )
    out = (
        sessionize(ray.data.from_arrow(t), gap_s=1800)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expect = {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6, 7: 7, 8: 7}
    got = dict(zip(out["event_id"], out["session_id"]))
    assert got == expect, got


def test_sessionize_oracle_parity(ray_session, tmp_path):
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = (
        entry.queries()["sessionize_events"](sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["sessionize_events"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con.close()
    assert sorted(got.columns) == sorted(want.columns)
    for c in ["event_id", "user_id", "session_id"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_sliding_window_count_planted(ray_session):
    import ray.data

    from raydedup.sessions import sliding_window_count

    us = 1_000_000
    # user 1: events at 0s, 240s, 300s (exact window edge — included),
    # 601s (300s window from 601 starts at 301 — excludes 240 and 300);
    # user 2: two events at the SAME ts (RANGE peers: both count both).
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array(
                np.array([0, 240, 300, 601, 50, 50], np.int64) * us
            ).cast(pa.timestamp("us")),
        }
    )
    out = (
        sliding_window_count(ray.data.from_arrow(t), window_s=300)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out["n_window"].tolist() == [1, 2, 3, 1, 2, 2]
