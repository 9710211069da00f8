"""As-of join: planted fixture asserting <= semantics at timestamp
equality, greatest-id tie-break among equal right timestamps, NULL on
no-prior-match, and key isolation — plus end-to-end oracle parity through
the real queries() callable."""

import duckdb
import numpy as np
import pyarrow as pa


def _ts(sec: int):
    return (np.int64(sec) * 1_000_000).view("datetime64[us]")


def test_asof_join_planted(ray_session):
    import ray.data

    from raydedup.asof import asof_join

    left = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "ts": pa.array(np.array([10, 20, 5, 10, 10], np.int64) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "event_id": pa.array([100, 101, 102, 103, 104], pa.int64()),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(np.array([10, 10, 15, 50], np.int64) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "event_id": pa.array([7, 9, 8, 6], pa.int64()),
            "value": pa.array([0.5, 0.9, 0.7, 0.1], pa.float64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        by="user_id", on="ts", left_id="event_id", right_id="event_id",
        value_col="value",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    got = {}
    for _, r in out.iterrows():
        me, mv = r["matched_event_id"], r["matched_value"]
        got[int(r["event_id"])] = (
            None if np.isnan(me) else int(me),
            None if np.isnan(mv) else float(mv),
        )
    assert got[100] == (9, 0.9)   # ts equality visible; id 9 beats id 7 tie
    assert got[101] == (8, 0.7)   # latest right at ts 15
    assert got[102] == (None, None)  # no right row at/before ts 5
    assert got[103] == (None, None)  # user 2's only view is later (ts 50)
    assert got[104] == (None, None)  # user 3 has no right rows at all


def test_asof_oracle_parity(ray_session):
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = (
        entry.queries()["asof_purchase_attribution"](sf)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["asof_purchase_attribution"])
        .df().sort_values("event_id").reset_index(drop=True)
    )
    con.close()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
