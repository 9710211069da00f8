"""DSIR importance weighting (raydedup/dsir.py) — scalar-reference parity,
target-affinity behavior, and the select filter."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "content": pa.array([r[1] for r in rows]),
            }
        )
    )


# two distinguishable dialects: target repeats "alpha beta" bigrams,
# background repeats "zip zap"
TARGET = [(100 + i, "alpha beta alpha beta alpha beta gamma") for i in range(6)]
RAW = (
    [(i, "alpha beta alpha beta delta") for i in range(4)]
    + [(10 + i, "zip zap zip zap zip zap zoom") for i in range(8)]
    + [(50, "one two")]  # too rare: no modeled bigrams
    + [(51, "x")]  # < 2 tokens: zero bigrams
)


def _scalar_weights(raw, target, min_count):
    def bigrams(text):
        t = text.split()
        return [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]

    def model(rows):
        cnt = {}
        for _, tx in rows:
            for b in bigrams(tx):
                cnt[b] = cnt.get(b, 0) + 1
        return {b: c for b, c in cnt.items() if c >= min_count}

    mt, mr = model(target), model(raw)
    nt, nr = sum(mt.values()), sum(mr.values())
    out = {}
    for i, tx in raw:
        bs = bigrams(tx)
        ht = sum(mt.get(b, 0) for b in bs)
        hr = sum(mr.get(b, 0) for b in bs)
        w = (1.0 + float(ht) * float(nr)) / (1.0 + float(hr) * float(nt))
        out[i] = (len(bs), ht, hr, w)
    return out


def test_matches_scalar_reference(ray_session):
    from raydedup.dsir import dsir_weights

    got = (
        dsir_weights(_ds(RAW), _ds(TARGET), DEFAULT_CONFIG, min_count=2)
        .to_pandas()
        .set_index("id")
    )
    want = _scalar_weights(RAW, TARGET, 2)
    assert set(got.index) == set(want)
    for i, (nb, ht, hr, w) in want.items():
        row = got.loc[i]
        assert row["n_bigrams"] == nb
        assert row["hit_sum_t"] == ht
        assert row["hit_sum_r"] == hr
        assert row["weight"] == w  # bit-exact: same IEEE sequence


def test_target_like_docs_rank_higher(ray_session):
    from raydedup.dsir import dsir_weights

    got = (
        dsir_weights(_ds(RAW), _ds(TARGET), DEFAULT_CONFIG, min_count=2)
        .to_pandas()
        .set_index("id")
    )
    alpha_w = got.loc[0, "weight"]
    zip_w = got.loc[10, "weight"]
    assert alpha_w > zip_w  # target dialect outranks background dialect
    # no-bigram doc sits at the neutral weight 1.0
    assert got.loc[51, "weight"] == pytest.approx(1.0)


def test_dsir_select_threshold(ray_session):
    from raydedup.dsir import dsir_select, dsir_weights

    wdf = dsir_weights(
        _ds(RAW), _ds(TARGET), DEFAULT_CONFIG, min_count=2
    ).to_pandas()
    thr = 0.5  # between the background tier (~2.5e-4) and neutral 1.0
    kept = dsir_select(
        _ds(RAW), _ds(TARGET), thr, DEFAULT_CONFIG, min_count=2
    ).to_pandas()
    want_ids = set(wdf.loc[wdf["weight"] >= thr, "id"])
    assert set(kept["id"]) == want_ids
    assert 0 < len(kept) < len(RAW)


def test_keep_cols_pass_through(ray_session):
    import ray.data

    from raydedup.dsir import dsir_weights

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "content": pa.array(["alpha beta alpha beta", "zip zap"]),
            "src": pa.array(["a", "b"]),
        }
    )
    out = dsir_weights(
        ray.data.from_arrow(t),
        _ds(TARGET),
        DEFAULT_CONFIG,
        min_count=2,
        keep_cols=("src",),
    ).to_pandas()
    assert list(out.sort_values("id")["src"]) == ["a", "b"]
