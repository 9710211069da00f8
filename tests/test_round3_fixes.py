"""Round-3 ADVICE fixes: reservoir true-n finalize, string `by`/user keys in
asof_join + sessionize + sliding_window_count, and CLI --ckpt flag guards."""

import numpy as np
import pyarrow as pa
import pytest


def test_reservoir_true_n_beyond_k(ray_session):
    # a group larger than k must still report the true stream count, not
    # the capped sample length (ReservoirItemsSketch.getN() contract)
    import ray.data

    from raydedup.aggregates import reservoir_sample

    n = 5_000
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(["a"] * n), "v": pa.array(np.arange(n))})
    )
    rows = ds.groupby("g").aggregate(reservoir_sample("v", k=64, name="s")).take_all()
    assert len(rows) == 1
    s = rows[0]["s"]
    assert s["n"] == n
    assert len(s["samples"]) == 64
    assert all(0 <= x < n for x in s["samples"])


def test_asof_join_string_by_key(ray_session):
    import ray.data

    from raydedup.asof import asof_join

    left = pa.table(
        {
            "user": pa.array(["alice", "alice", "bob"], pa.string()),
            "ts": pa.array(np.array([20, 5, 10], np.int64) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "event_id": pa.array([100, 101, 102], pa.int64()),
        }
    )
    right = pa.table(
        {
            "user": pa.array(["alice", "bob"], pa.string()),
            "ts": pa.array(np.array([10, 50], np.int64) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "event_id": pa.array([7, 6], pa.int64()),
            "value": pa.array([0.5, 0.1], pa.float64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        by="user", on="ts", left_id="event_id", right_id="event_id",
        value_col="value",
    )
    tbl = out.to_pandas()
    assert tbl["user"].dtype == object  # string key survives with its type
    got = {
        int(r["event_id"]): (r["user"], r["matched_event_id"])
        for _, r in tbl.iterrows()
    }
    assert got[100][0] == "alice" and int(got[100][1]) == 7
    assert got[101][0] == "alice" and np.isnan(got[101][1])
    assert got[102][0] == "bob" and np.isnan(got[102][1])


def test_sessionize_and_window_string_user_key(ray_session):
    import ray.data

    from raydedup.sessions import sessionize, sliding_window_count

    ev = pa.table(
        {
            "user_id": pa.array(["u1", "u1", "u1", "u2"], pa.string()),
            "ts": pa.array(np.array([0, 100, 5000, 100], np.int64) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(ev)
    out = sessionize(ds, gap_s=1800).to_pandas()
    sess = {int(r["event_id"]): (r["user_id"], int(r["session_id"]))
            for _, r in out.iterrows()}
    assert sess[1] == ("u1", 1)
    assert sess[2] == ("u1", 1)
    assert sess[3] == ("u1", 3)  # 4900 s gap > 1800 s starts a new session
    assert sess[4] == ("u2", 4)

    win = sliding_window_count(ds, window_s=300).to_pandas()
    w = {int(r["event_id"]): (r["user_id"], int(r["n_window"]))
         for _, r in win.iterrows()}
    assert w[1] == ("u1", 1)
    assert w[2] == ("u1", 2)  # event 1 is 100 s earlier, inside 300 s
    assert w[3] == ("u1", 1)
    assert w[4] == ("u2", 1)


def test_cli_ckpt_flag_guards(tmp_path):
    from raydedup.__main__ import main

    with pytest.raises(SystemExit) as ei:
        main(["dedup", "in.parquet", "--ckpt", str(tmp_path), "--survivors"])
    assert ei.value.code == 2
    with pytest.raises(SystemExit) as ei:
        main(["dedup", "in.parquet", "--ckpt", str(tmp_path),
              "--id-col", "doc_id"])
    assert ei.value.code == 2
