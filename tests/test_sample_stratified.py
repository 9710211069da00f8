"""Stratified sampling operator (raydedup/curate.py sample_stratified):
modulo-mode DuckDB parity, hash-mode rate accuracy + growth stability,
boundary-threshold integrity, validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

RATES = {"a": 1.0, "b": 0.5, "c": 0.25, "d": 0.0}


def _table(n: int, start: int = 0) -> pa.Table:
    ids = np.arange(start, start + n, dtype=np.int64)
    src = np.array(["a", "b", "c", "d", "e"])[ids % 5]
    return pa.table({"doc_id": ids, "source": src})


def test_modulo_mode_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from raydedup.curate import sample_stratified, stratified_thresholds

    t = _table(5_000)
    out = (
        sample_stratified(
            ray.data.from_arrow(t).repartition(7),
            key="source", id_col="doc_id",
            rates=RATES, default_rate=0.2, method="modulo", buckets=1000,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    thr = stratified_thresholds(RATES, 0.2, 1000)
    default = thr.pop("__default__")
    cases = " ".join(f"WHEN source = '{k}' THEN {v}" for k, v in thr.items())
    want = duckdb.sql(
        f"SELECT doc_id, source FROM t WHERE doc_id % 1000 < "
        f"(CASE {cases} ELSE {default} END) ORDER BY doc_id"
    ).df()
    np.testing.assert_array_equal(out["doc_id"], want["doc_id"])
    assert (out["source"] == want["source"]).all()
    assert "d" not in set(out["source"])          # rate 0 keeps nothing
    assert (out["source"] == "a").sum() == 1000   # rate 1 keeps all


def test_hash_mode_rate_accuracy_and_growth_stability(ray_session):
    import ray.data

    from raydedup.curate import sample_stratified

    n = 50_000
    t = _table(n)
    kw = dict(key="source", id_col="doc_id", rates=RATES,
              default_rate=0.2, method="hash", seed=13)
    out = sample_stratified(ray.data.from_arrow(t), **kw).to_pandas()
    per = out.groupby("source").size()
    assert per.get("d", 0) == 0
    assert per["a"] == n // 5
    for src, rate in [("b", 0.5), ("c", 0.25), ("e", 0.2)]:
        frac = per.get(src, 0) / (n // 5)
        assert abs(frac - rate) < 0.02, (src, frac)
    # growth stability: adding rows never flips an existing row's fate
    bigger = sample_stratified(
        ray.data.from_arrow(_table(2 * n)), **kw
    ).to_pandas()
    old = set(out["doc_id"])
    new_within_old_range = {d for d in bigger["doc_id"] if d < n}
    assert new_within_old_range == old


def test_validation_and_boundary(ray_session):
    import ray.data

    from raydedup.curate import sample_stratified, stratified_thresholds

    with pytest.raises(ValueError):
        sample_stratified(
            ray.data.from_arrow(_table(10)), key="source", id_col="doc_id",
            rates={"a": 1.5}, method="modulo",
        )
    with pytest.raises(ValueError):
        sample_stratified(
            ray.data.from_arrow(_table(10)), key="source", id_col="doc_id",
            rates={}, default_rate=-0.1,
        )
    # intended-integer boundary: 0.1+0.2-style float products don't drift
    thr = stratified_thresholds({"x": 0.3}, 1.0, 1_000_000)
    assert thr["x"] == 300_000
    assert stratified_thresholds({}, 0.15, 100)["__default__"] == 15
