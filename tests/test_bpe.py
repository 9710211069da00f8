"""BPE pair counting (raydedup/bpe.py) vs a string-level brute force —
occurrence weighting, min_count threshold, unicode fallback path, and the
sf0.001 corpus sweep."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa


def _brute(texts, min_count):
    counts: Counter = Counter()
    for t in texts:
        s = (t or "").strip(" \t\n\r\v\f")
        if not s:
            continue
        for w in re.split(r"[ \t\n\f\r]+", s):  # RE2 \s class (no \v)
            counts.update(w[j : j + 2] for j in range(len(w) - 1))
    return {p: c for p, c in counts.items() if c >= min_count}


def _run(ray, texts, min_count):
    import ray.data

    from raydedup.bpe import bpe_pair_counts

    ds = ray.data.from_arrow(
        pa.table({"content": pa.array(texts, pa.string())})
    )
    t = bpe_pair_counts(ds, min_count=min_count).to_pandas()
    return dict(zip(t["pair"], t["pair_count"].astype(int)))


def test_bpe_pairs_bruteforce_and_unicode(ray_session):
    import ray

    texts = [
        "low lower lowest low low",
        "newer newest new",
        "ab ab ab",  # 'ab' x3 occurrences
        "a b c",  # single-char tokens → no pairs
        "",  # empty
        None,  # null
        "héllo héllo héllo café café café",  # multibyte fallback path
        "日本語 日本語 日本語",  # fully non-ASCII
    ]
    for mc in (2, 3, 5):
        assert _run(ray, texts, mc) == _brute(texts, mc), mc
    # occurrence weighting: 'ab' three times → count 3 at threshold 3
    got = _run(ray, texts, 3)
    assert got["ab"] == 3
    assert got["hé"] == 3 and got["fé"] == 3 and got["日本"] == 3


def test_bpe_pairs_on_corpus_fixture(ray_session):
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from raydedup.bpe import bpe_pair_counts
    from raydedup.corpus import corpus_parquet_path

    path = corpus_parquet_path("/root/testdata/sf0.001")
    texts = pq.read_table(path, columns=["content"]).column("content").to_pylist()
    want = _brute(texts, 3)
    ds = ray.data.read_parquet(path, columns=["content"])
    got = _run_ds(ds)
    assert got == want
    assert len(got) > 100


def _run_ds(ds):
    from raydedup.bpe import bpe_pair_counts

    t = bpe_pair_counts(ds, min_count=3).to_pandas()
    return dict(zip(t["pair"], t["pair_count"].astype(int)))
