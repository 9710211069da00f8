"""Bigram-LM quality scoring (raydedup/lm.py) vs a string-level brute
force: occurrence (not distinct) counting, min_count pruning boundary,
short/empty docs, and cross-corpus model reuse."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa


def _bigrams(text: str | None) -> list[str]:
    t = (text or "").strip(" \t\n\r\v\f")
    tl = re.split(r"[ \t\n\f\r]+", t)  # RE2 \s class (no \v)
    if len(tl) < 2:
        return []
    return [f"{a} {b}" for a, b in zip(tl, tl[1:])]


def _brute(train: dict[int, str | None], score_docs: dict[int, str | None], min_count: int):
    model = Counter()
    for t in train.values():
        model.update(_bigrams(t))
    model = {w: c for w, c in model.items() if c >= min_count}
    out = {}
    for i, t in score_docs.items():
        bs = _bigrams(t)
        hits = [model[w] for w in bs if w in model]
        out[i] = (
            len(bs),
            len(hits),
            sum(hits),
            float(sum(hits)) / max(len(bs), 1),
        )
    return out


def _run(ray, docs, min_count, model=None):
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.lm import lm_scores

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(docs), pa.int64()),
                "content": pa.array([docs[i] for i in docs], pa.string()),
            }
        )
    )
    t = lm_scores(
        ds, DEFAULT_CONFIG, min_count=min_count, model=model
    ).to_pandas()
    return {
        int(r["id"]): (
            int(r["n_bigrams"]),
            int(r["n_hits"]),
            int(r["hit_sum"]),
            float(r["score"]),
        )
        for _, r in t.iterrows()
    }


def test_lm_scores_matches_bruteforce(ray_session):
    docs = {
        1: "the cat sat on the mat and the cat sat again",  # repeats count
        2: "the cat sat on a rug",
        3: "the cat sat",  # 2 bigrams
        4: "completely unrelated gibberish tokens here",
        5: "single",  # no bigrams
        6: "",  # empty
        7: None,  # null
        8: "the cat sat on the mat",
    }
    for min_count in (2, 3):
        want = _brute(docs, docs, min_count)
        got = _run(__import__("ray"), docs, min_count)
        assert got == want, min_count
    # boundary: "the cat" occurs 4x, "sat on" 3x, "sat again" 1x —
    # min_count=3 keeps the first two and drops the third
    got = _run(__import__("ray"), docs, 3)
    assert got[4] == (4, 0, 0, 0.0)
    assert got[5] == (0, 0, 0, 0.0) and got[6] == (0, 0, 0, 0.0)


def test_lm_model_reuse_cross_corpus(ray_session):
    """CCNet shape: train on a clean corpus, score a different one."""
    import ray
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.lm import bigram_model

    train = {i: "alpha beta gamma delta " * 4 for i in range(6)}
    score = {100: "alpha beta something else", 101: "nothing shared at all"}
    tds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(train), pa.int64()),
                "content": pa.array([train[i] for i in train], pa.string()),
            }
        )
    )
    model = bigram_model(tds, DEFAULT_CONFIG, min_count=3)
    want = _brute(train, score, 3)
    got = _run(ray, score, 3, model=model)
    assert got == want
    assert got[100][1] > 0 and got[101][1] == 0


def test_lm_scores_on_corpus_fixture(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from raydedup.corpus import corpus_parquet_path

    path = corpus_parquet_path("/root/testdata/sf0.001")
    tbl = pq.read_table(path, columns=["id", "content"])
    docs = dict(
        zip(tbl.column("id").to_pylist(), tbl.column("content").to_pylist())
    )
    want = _brute(docs, docs, 3)
    import ray

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.lm import lm_scores

    ds = ray.data.read_parquet(path, columns=["id", "content"])
    t = lm_scores(ds, DEFAULT_CONFIG, min_count=3).to_pandas()
    got = {
        int(r["id"]): (
            int(r["n_bigrams"]),
            int(r["n_hits"]),
            int(r["hit_sum"]),
            float(r["score"]),
        )
        for _, r in t.iterrows()
    }
    assert got == want
    scores = np.array([v[3] for v in got.values()])
    assert (scores > 0).mean() > 0.9  # self-scored corpus mostly in-model
