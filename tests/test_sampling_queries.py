"""Exact-regime parity for the sampling-family queries() entries
(varopt_qty_by_flag, reservoir_events_by_type) vs their DuckDB oracles at
sf0.001 — the same comparison the driver's oracle gate runs at sf0.01."""

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _run(name: str):
    import __ray_entry__ as entry

    got = entry.queries()[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ["lineitem", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = con.execute(entry.oracle_sql()[name]).df()
    con.close()
    return got.reset_index(drop=True), want.reset_index(drop=True)


def test_varopt_qty_by_flag_exact_region(ray_session):
    got, want = _run("varopt_qty_by_flag")
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # exact H region: bounds collapse onto the estimate
    assert (got["lb_qty"] == got["est_qty"]).all()
    assert (got["ub_qty"] == got["est_qty"]).all()


def test_reservoir_events_by_type_exact_region(ray_session):
    got, want = _run("reservoir_events_by_type")
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
