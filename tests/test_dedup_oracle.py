"""Value-hash oracle for the flagship clustering machinery: the
dedup_clusters_oracle query (exact sha ∪ exact n-gram-Jaccard ∪ verified
containment edges closed by the SAME cluster_edges + assign_clusters path
the flagship uses) must match the DuckDB recursive-CTE min-label fixpoint
bit-for-bit at sf0.001 — the same comparison the driver runs at sf0.01."""

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_dedup_clusters_oracle_parity(ray_session):
    import __ray_entry__ as entry

    got = entry.queries()["dedup_clusters_oracle"](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(entry.oracle_sql()["dedup_clusters_oracle"]).df()
    con.close()
    got = got.sort_values(["id"]).reset_index(drop=True)
    want = want.sort_values(["id"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()
    assert (got["cluster_id"].to_numpy() == want["cluster_id"].to_numpy()).all()
    # sanity: the fixture actually exercises clustering (non-singleton
    # components exist) and every root is the component minimum
    cl = got["cluster_id"].to_numpy()
    assert (cl <= got["id"].to_numpy()).all()
    assert len(np.unique(cl)) < len(got)
