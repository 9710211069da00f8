"""Local correctness harness mimicking the driver: run every queries()
entry at sf0.01 alongside its oracle_sql() and compare row-count, schema,
and order-insensitive values. Usage: python scripts/check_oracle.py [names…]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import ray
import ray.data

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS {len(ray_df)} != {len(sql_df)}"
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                d = np.abs(av.astype(float) - bv.astype(float))
                return f"VALUES col {c}: maxdiff {np.nanmax(d)}"
        else:
            if not (av == bv).all():
                i = int(np.argmax(av != bv))
                return f"VALUES col {c}: row {i}: {av[i]!r} != {bv[i]!r}"
    return "OK"


def main() -> None:
    only = set(sys.argv[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    n_ok = n_bad = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} QUERY ERROR: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:32s} rows={len(ray_df):6d}  (rows-only, {dt:.1f}s)")
            n_weak += 1
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ORACLE ERROR: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        mark = "OK " if verdict == "OK" else "BAD"
        if verdict == "OK":
            n_ok += 1
        else:
            n_bad += 1
        print(f"{name:32s} {mark} rows={len(ray_df):6d}  {dt:.1f}s  {verdict}")
    print(f"\n{n_ok} oracle-matched, {n_weak} rows-only, {n_bad} failures")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
