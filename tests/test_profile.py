"""profile_sources rollup vs its exact-SQL mirror at sf0.001 (a second
scale point beyond the driver's sf0.01 gate) — exercises the KLL median
rank convention and the theta exact regime per group."""

from __future__ import annotations

import pandas as pd


def test_profile_sources_matches_sql(ray_session):
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = (
        entry.queries()["profile_sources"](sf)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["profile_sources"])
        .fetchdf()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
    assert (got["distinct_tokens"] > 0).all() and len(got) >= 5
