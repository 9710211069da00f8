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


# ---------------------------------------------------------------------------
# full BPE training loop + apply (round-4)
# ---------------------------------------------------------------------------


def _scalar_bpe(texts, n_merges, min_count=1):
    """Classic Sennrich word-level BPE, scalar reference: word-frequency
    table, per-round overlap-inclusive pair counting weighted by word
    count, argmax with (count desc, left asc, right asc) tie-break, greedy
    left-to-right non-overlapping merge application."""
    words: Counter = Counter()
    for t in texts:
        s = (t or "").strip(" \t\n\r\v\f")
        if not s:
            continue
        for w in re.split(r"[ \t\n\f\r]+", s):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    merges, rows = [], []
    for rank in range(1, n_merges + 1):
        pc_: Counter = Counter()
        for w, cnt in words.items():
            seq = vocab[w]
            for a, b in zip(seq, seq[1:]):
                pc_[(a, b)] += cnt
        cand = [(c, l, r) for (l, r), c in pc_.items() if c >= min_count]
        if not cand:
            break
        cand.sort(key=lambda x: (-x[0], x[1], x[2]))
        c, l, r = cand[0]
        merges.append((l, r))
        rows.append({"rank": rank, "lhs": l, "rhs": r, "merged": l + r,
                     "pair_count": c})
        for w in vocab:
            seq = vocab[w]
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            vocab[w] = out
    return merges, rows, vocab, words


FIXTURE_TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "aaaa aaa aa aaaa aaaa",           # l==r overlap runs
    "héllo héllo naïve naïve über",    # multibyte fallback path
    "ab ab ba ba",                     # tie-break exercise
    "  ",                              # empty after trim
    "singlechar x y z",
]


def test_train_bpe_matches_scalar_reference(ray_session):
    import ray.data

    from raydedup.bpe import bpe_train_table, tokenize_with_merges, train_bpe, bpe_word_tokenization

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(range(len(FIXTURE_TEXTS)), pa.int64()),
                  "content": pa.array(FIXTURE_TEXTS, pa.string())})
    )
    n_merges, min_count = 12, 2
    want_merges, want_rows, want_vocab, want_words = _scalar_bpe(
        FIXTURE_TEXTS, n_merges, min_count
    )
    res = train_bpe(ds, n_merges, min_count=min_count)
    assert res["merges"] == want_merges
    got_rows = [
        {k: r[k] for k in ("rank", "lhs", "rhs", "merged", "pair_count")}
        for r in res["merge_rows"]
    ]
    assert got_rows == want_rows

    # word-level tokenization parity
    wt = bpe_word_tokenization(res["word_table"], res["symbols"]).to_pandas()
    got_tok = dict(zip(wt["w"], wt["bpe"]))
    want_tok = {w: " ".join(seq) for w, seq in want_vocab.items()}
    assert got_tok == want_tok

    # doc-level apply: per-doc BPE symbol counts
    counts = tokenize_with_merges(ds, res).to_pandas().sort_values("id")
    want_counts = []
    for t in FIXTURE_TEXTS:
        s = (t or "").strip(" \t\n\r\v\f")
        if not s:
            want_counts.append(0)
            continue
        want_counts.append(
            sum(len(want_vocab[w]) for w in re.split(r"[ \t\n\f\r]+", s))
        )
    assert counts["n_bpe"].tolist() == want_counts

    # bpe_train_table mirrors merge_rows
    tbl = bpe_train_table(ds, n_merges, min_count=min_count)
    assert tbl.column("lhs").to_pylist() == [r["lhs"] for r in want_rows]
    assert tbl.column("pair_count").to_pylist() == [r["pair_count"] for r in want_rows]


def test_train_bpe_batched_merges_are_disjoint_and_consistent(ray_session):
    import ray.data

    from raydedup.bpe import train_bpe

    ds = ray.data.from_arrow(
        pa.table({"content": pa.array(FIXTURE_TEXTS * 3, pa.string())})
    )
    res = train_bpe(ds, 9, min_count=2, merges_per_round=3)
    assert len(res["merges"]) <= 9
    # within each round of 3, chosen pairs are symbol-disjoint
    rows = res["merge_rows"]
    for start in range(0, len(rows), 3):
        batch = rows[start : start + 3]
        seen: set[str] = set()
        for r in batch:
            assert r["lhs"] not in seen and r["rhs"] not in seen
            seen.update((r["lhs"], r["rhs"], r["merged"]))
    # merged strings always concatenate their parts
    for r in rows:
        assert r["merged"] == r["lhs"] + r["rhs"]


def test_apply_merge_flat_runs_and_boundaries():
    import numpy as np

    from raydedup.bpe import _apply_merge_flat

    # words: [a a a a], [a a a], [b a], [a]  (a=0, b=1)
    flat = np.array([0, 0, 0, 0, 0, 0, 0, 1, 0, 0], dtype=np.int32)
    off = np.array([0, 4, 7, 9, 10], dtype=np.int64)
    nf, no = _apply_merge_flat(flat, off, 0, 0, 2)
    # aaaa -> ZZ ; aaa -> Za ; ba -> ba ; a -> a
    assert nf.tolist() == [2, 2, 2, 0, 1, 0, 0]
    assert no.tolist() == [0, 2, 4, 6, 7]
    # word-boundary pair (end of word3 'a', start of word4 'a') must NOT merge
    flat2 = np.array([0, 0], dtype=np.int32)
    off2 = np.array([0, 1, 2], dtype=np.int64)
    nf2, no2 = _apply_merge_flat(flat2, off2, 0, 0, 2)
    assert nf2.tolist() == [0, 0] and no2.tolist() == [0, 1, 2]


def test_bpe_encode_docs_matches_scalar(ray_session):
    import ray.data

    from raydedup.bpe import bpe_encode_docs, train_bpe

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(range(len(FIXTURE_TEXTS)), pa.int64()),
                  "content": pa.array(FIXTURE_TEXTS, pa.string())})
    )
    _, _, vocab, _ = _scalar_bpe(FIXTURE_TEXTS, 12, 2)
    res = train_bpe(ds, 12, min_count=2)
    out = bpe_encode_docs(ds, res).to_pandas().sort_values("id")
    for i, t in enumerate(FIXTURE_TEXTS):
        s = (t or "").strip(" \t\n\r\v\f")
        toks = re.split(r"[ \t\n\f\r]+", s) if s else []
        want = " ".join(" ".join(vocab[w]) for w in toks)
        want_n = sum(len(vocab[w]) for w in toks)
        row = out[out["id"] == i].iloc[0]
        assert row["bpe_text"] == want
        assert row["n_bpe"] == want_n


def test_apply_raises_on_oov(ray_session):
    """Both apply operators share one OOV contract: a token absent from
    the training vocabulary raises KeyError (never a silent 0 count)."""
    import pytest
    import ray.data

    from raydedup.bpe import bpe_encode_docs, tokenize_with_merges, train_bpe

    train = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "content": pa.array(["low lower lowest", "low low lower"]),
            }
        )
    )
    other = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([9], pa.int64()),
                "content": pa.array(["unseen tokens here"]),
            }
        )
    )
    res = train_bpe(train, 3, min_count=2)
    for fn in (tokenize_with_merges, bpe_encode_docs):
        with pytest.raises(Exception, match="not in the trained vocabulary"):
            fn(other, res).to_pandas()
    # in-vocabulary apply still works
    ok = tokenize_with_merges(train, res).to_pandas()
    assert (ok["n_bpe"] > 0).all()
