"""Driver-contract smoke: entry() and a sample of queries() run under an
externally-initialised Ray session (the driver's calling pattern)."""

from __future__ import annotations

import pytest


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    out = e.entry()
    df = out.to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"id", "cluster_id"}
    # every row assigned; clusters keyed by member minimum
    assert (df.groupby("cluster_id")["id"].min().values
            == df.groupby("cluster_id")["id"].min().index.values).all()


def test_queries_have_oracles_registered():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 18
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle without query: {unknown}"
    assert len(oracles) >= 12


@pytest.mark.parametrize("name", ["exact_dup_groups", "text_stats"])
def test_query_runs_small(ray_session, name):
    import __ray_entry__ as e

    res = e.queries()[name]("/root/testdata/sf0.001")
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
