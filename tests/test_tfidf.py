"""tf-idf top-terms operator (raydedup/vocab.py tfidf_top_terms) vs a
string-level brute force: score ties, docs with fewer than k in-vocab
terms, OOV-only docs emitting nothing, multi-partition."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa


def _brute(texts, v, k):
    toks = [(t or "").split() if (t or "").strip() else [] for t in texts]
    counts = Counter(t for x in toks for t in x)
    vocab = {t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:v]}
    df = Counter(t for x in toks for t in set(x) if t in vocab)
    nd = len(texts)
    rows = []
    for i, x in enumerate(toks):
        tf = Counter(t for t in x if t in vocab)
        scored = sorted(
            ((float(c) * nd / df[t], t) for t, c in tf.items()),
            key=lambda st: (-st[0], st[1]),
        )[:k]
        for r, (s, t) in enumerate(scored, 1):
            rows.append((i, t, r, np.floor(s * 1e6) / 1e6))
    return rows


def test_tfidf_top_terms_matches_bruteforce(ray_session):
    import ray.data

    from raydedup.vocab import tfidf_top_terms

    rng = np.random.default_rng(17)
    words = [f"w{i:02d}" for i in range(14)] + ["rare1", "rare2"]
    texts = []
    for i in range(60):
        n = rng.integers(4, 25)
        texts.append(" ".join(rng.choice(words, size=n)))
    texts[3] = "w00"              # single in-vocab token → 1 row
    texts[9] = None               # no tokens → no rows
    texts[21] = "zzz yyy xxx"     # all OOV (below top-10) → likely no rows
    texts[30] = "w01 w01 w02 w02" # exact tf tie → term-asc break
    v, k = 10, 3
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": texts})
    ).repartition(6)
    out = (
        tfidf_top_terms(ds, v=v, k=k)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    want = sorted(_brute(texts, v, k))
    got = list(
        out[["doc_id", "term", "rank", "score"]].itertuples(index=False, name=None)
    )
    assert sorted(got) == want
    assert 9 not in set(out["doc_id"])  # empty doc emits nothing
    assert (out[out.doc_id == 3]["rank"] == [1]).all()
