"""Sketch-warehouse aggregates: theta_sketch_agg (finalize to stored bytes)
+ theta_union_sketches (query-time union over a column of stored cells) —
the store-sketches-merge-at-query-time pattern
(reference theta/package-info.java:20-26, theta/Union.java)."""

import duckdb
import numpy as np
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_theta_rollup_regions_parity(ray_session):
    import __ray_entry__ as entry

    got = entry.queries()["theta_rollup_regions"](SF_DIR).to_pandas()
    con = duckdb.connect()
    for t in ["customer", "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = con.execute(entry.oracle_sql()["theta_rollup_regions"]).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_stored_sketch_union_matches_direct_build(ray_session):
    """Union of persisted per-partition sketches must estimate like one
    sketch built over the concatenated stream (estimation mode)."""
    import ray.data

    from raydedup.aggregates import theta_sketch_agg, theta_union_sketches
    from raydedup.kmv import KmvSketch, build_sketch, union_many
    from raydedup.hashing import theta_hash_u64s

    rng = np.random.default_rng(7)
    n, k = 200_000, 1 << 10
    keys = rng.integers(0, 120_000, size=n, dtype=np.int64)
    part = (keys % 8).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"part": pa.array(part), "key": pa.array(keys)})
    )
    rows = ds.groupby("part").aggregate(
        theta_sketch_agg("key", k=k, name="sk")
    ).take_all()
    stored = pa.table({"sk": pa.array([r["sk"] for r in rows], pa.binary())})
    merged_est = ray.data.from_arrow(stored).aggregate(
        theta_union_sketches("sk", k=k, name="est")
    )["est"]

    direct = build_sketch(
        theta_hash_u64s(keys.view(np.uint64), 9001), k
    )
    true_distinct = len(np.unique(keys))
    # both are theta estimates with RSE ~ 1/sqrt(k) ≈ 3.1%; assert each
    # within 4 sigma of truth and the union path is a VALID theta sketch
    # (union of partials need not bit-match a single-stream build, but the
    # estimates must agree within the error contract)
    for est in (merged_est, direct.estimate()):
        assert abs(est - true_distinct) / true_distinct < 4.0 / np.sqrt(k)
    # exact regime: large k makes stored-union bit-match a direct build
    rows = ds.groupby("part").aggregate(
        theta_sketch_agg("key", k=1 << 18, name="sk")
    ).take_all()
    merged = union_many([KmvSketch.deserialize(r["sk"]) for r in rows], 1 << 18)
    assert merged.estimate() == float(true_distinct)
