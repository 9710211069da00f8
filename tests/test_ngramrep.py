"""Gopher n-gram repetition signals (raydedup/ngramrep.py) — scalar
reference parity and planted repetition/overlap cases."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from raydedup.ngramrep import DUP_NS, TOP_NS, ngram_repetition_signals


def _run(texts):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    return ngram_repetition_signals(t).to_pydict()


def _scalar(text):
    toks = text.split() if text.strip() else []
    T = len(toks)
    denom = max(sum(len(w) for w in toks) + max(T - 1, 0), 1)
    out = {}
    for n in TOP_NS + DUP_NS:
        grams = [tuple(toks[i : i + n]) for i in range(T - n + 1)]
        if n in TOP_NS:
            if not grams:
                out[f"top_{n}gram_char_frac"] = 0.0
                continue
            cnt = Counter(grams)
            glen = lambda g: sum(len(w) for w in g) + (n - 1)
            best = max(cnt, key=lambda g: (cnt[g], glen(g)))
            num = float(cnt[best]) * float(glen(best))
            out[f"top_{n}gram_char_frac"] = math.floor(num / denom * 1e6) / 1e6
        else:
            cnt = Counter(grams)
            covered = set()
            for i, g in enumerate(grams):
                if cnt[g] >= 2:
                    covered.update(range(i, i + n))
            dup_chars = sum(len(toks[i]) for i in covered)
            out[f"dup_{n}gram_char_frac"] = (
                math.floor(dup_chars / denom * 1e6) / 1e6
            )
    return out


def test_matches_scalar_reference():
    rng = np.random.default_rng(3)
    vocab = ["aa", "bbb", "cccc", "dd", "e", "ffffff"]
    docs = []
    for i in range(60):
        T = int(rng.integers(0, 40))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), T)]
        if i % 3 == 0 and T >= 12:  # plant a repeated 6-gram
            toks[6:12] = toks[0:6]
        docs.append(" ".join(toks))
    docs += ["", "   ", "one"]
    got = _run(docs)
    for i, d in enumerate(docs):
        want = _scalar(d)
        for k, v in want.items():
            assert got[k][i] == v, (i, k, d)


def test_planted_full_repetition():
    # 12 x "ab": every n-gram up to 10 occurs at least twice
    doc = " ".join(["ab"] * 12)
    r = _run([doc])
    # top bigram "ab ab" occurs 11 times, len 5; denom = 24+11 = 35
    assert r["top_2gram_char_frac"][0] == math.floor(55 / 35 * 1e6) / 1e6
    for n in DUP_NS:
        # all 12 tokens covered → 24/35
        assert r[f"dup_{n}gram_char_frac"][0] == math.floor(24 / 35 * 1e6) / 1e6


def test_no_repetition_scores_zero_dup():
    doc = " ".join(f"tok{i}" for i in range(30))
    r = _run([doc])
    for n in DUP_NS:
        assert r[f"dup_{n}gram_char_frac"][0] == 0.0
    # unique doc: top n-gram occurs once
    assert 0 < r["top_2gram_char_frac"][0] < 0.1


def test_overlap_counted_once():
    # "x x x x x x" (6 tokens): the 5-gram at p=1 and p=2 both duplicate
    # ... actually both occurrences of the same gram; coverage = all 6
    # tokens counted once, not 10
    doc = " ".join(["x"] * 6)
    r = _run([doc])
    # denom = 6 + 5 = 11; covered token chars = 6
    assert r["dup_5gram_char_frac"][0] == math.floor(6 / 11 * 1e6) / 1e6


def test_tie_breaks_to_longer_gram():
    # two bigrams each occur twice: "aa bb" (len 5) and "c d" (len 3) —
    # the longer one must win the top slot
    doc = "aa bb aa bb zz c d yy c d"
    r = _run([doc])
    want = _scalar(doc)
    assert r["top_2gram_char_frac"][0] == want["top_2gram_char_frac"]
    # denom = 16 token chars + 9 spaces = 25; "aa bb" len 5, count 2
    assert want["top_2gram_char_frac"] == math.floor(2 * 5 / 25 * 1e6) / 1e6


def test_short_docs_have_no_ngrams():
    r = _run(["only three tokens", "two tokens"])
    assert r["top_4gram_char_frac"] == [0.0, 0.0]
    assert r["top_2gram_char_frac"][1] > 0  # "two tokens" has one bigram
    for n in DUP_NS:
        assert r[f"dup_{n}gram_char_frac"] == [0.0, 0.0]
