"""Gopher quality-rule filter (raydedup/gopher.py) — crafted cases firing
every rule in both directions, plus a brute-force scalar cross-check."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.gopher import (
    BULLET_PREFIXES,
    ELLIPSIS_SUFFIX,
    MIN_WORDS,
    STOP_WORDS,
    gopher_rules,
)

# a 60-word doc that passes every rule: mean length in [3,10], stop words
# present, alphabetic, no symbols/bullets/ellipses
GOOD = " ".join(
    ["the", "be", "quick", "brown", "foxes"] + ["running"] * 55
)


def _rules(texts, ids=None):
    ids = ids or list(range(len(texts)))
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    )
    return gopher_rules(t).to_pydict()


def test_good_doc_passes_everything():
    r = _rules([GOOD])
    for col in (
        "word_count_ok",
        "mean_word_len_ok",
        "symbol_ok",
        "bullet_ok",
        "ellipsis_ok",
        "alpha_ok",
        "stop_ok",
        "gopher_pass",
    ):
        assert r[col] == [True], col
    assert r["n_words"] == [60]
    assert r["n_stop_hits"] == [2]  # 'the' and 'be', each once distinct


def test_word_count_bounds():
    short = " ".join(["the", "be"] + ["word"] * (MIN_WORDS - 3))  # 49 words
    at_min = " ".join(["the", "be"] + ["word"] * (MIN_WORDS - 2))  # 50
    r = _rules([short, at_min])
    assert r["word_count_ok"] == [False, True]
    assert r["gopher_pass"] == [False, True]


def test_mean_word_length_bounds():
    # mean length 2 (< 3) fails; long words (mean 11 > 10) fail
    short_words = "the be " + " ".join(["ab"] * 58)
    long_words = "the be " + " ".join(["x" * 11] * 580)
    r = _rules([short_words, long_words])
    assert r["mean_word_len_ok"] == [False, False]
    # boundary: exactly mean 3 passes (3*n == chars)
    exact3 = "the be " + " ".join(["abc"] * 58)  # chars=3+2+3*58=179, 3*60=180 → fails!
    chars = 3 + 2 + 3 * 58
    assert chars < 3 * 60
    r2 = _rules([exact3])
    assert r2["mean_word_len_ok"] == [False]


def test_symbol_ratio():
    base = ["the", "be"] + ["word"] * 58
    ok = " ".join(base) + " " + "#" * 6  # 61 words, 6 '#' → 60 ≤ 61 ok
    bad = " ".join(base) + " " + "# " * 7  # '#'x7 → 70 > 67
    r = _rules([ok, bad])
    assert r["symbol_ok"] == [True, False]
    # the rule is PER symbol class (Gopher: "either the hash symbol or the
    # ellipsis"): 4 '#' + 4 '...' on 67 words passes (40 <= 67 each) even
    # though the combined count would fail a summed 0.1 ratio on 61 words
    both = " ".join(base) + " #### " + "... ... ... ..."
    assert _rules([both])["symbol_ok"] == [True]
    # '....' counts as ONE non-overlapping '...'; unicode '…' also counts
    r2 = _rules(["...." + GOOD, "… …" + GOOD])
    assert r2["n_ellipsis_symbols"] == [1, 2]
    assert r2["n_hash_symbols"] == [0, 0]


def test_bullet_and_ellipsis_lines():
    for p in BULLET_PREFIXES:
        doc = "\n".join(f"{p}item {i}" for i in range(10))
        r = _rules([doc])
        assert r["n_bullet_lines"] == [10]
        assert r["bullet_ok"] == [False]  # 100% > 90%
    mixed = "\n".join([f"- item {i}" for i in range(9)] + ["plain line"])
    assert _rules([mixed])["bullet_ok"] == [True]  # exactly 90%
    ell = "\n".join(
        [f"line {i}{ELLIPSIS_SUFFIX}" for i in range(4)]
        + [f"line {i}" for i in range(6)]
    )
    r = _rules([ell])
    assert r["n_ellipsis_lines"] == [4]
    assert r["ellipsis_ok"] == [False]  # 40% > 30%


def test_alpha_fraction_and_stop_words():
    words = ["the", "be"] + ["alpha"] * 46 + ["123"] * 12  # 48/60 alpha = 80%
    assert _rules([" ".join(words)])["alpha_ok"] == [True]
    words_bad = ["the", "be"] + ["alpha"] * 45 + ["123"] * 13
    assert _rules([" ".join(words_bad)])["alpha_ok"] == [False]
    no_stop = " ".join(["word"] * 60)
    one_stop = "the " + " ".join(["word"] * 59)
    r = _rules([no_stop, one_stop])
    assert r["n_stop_hits"] == [0, 1]
    assert r["stop_ok"] == [False, False]
    # repeats of one stop word still count once
    rep = " ".join(["the"] * 60)
    assert _rules([rep])["n_stop_hits"] == [1]


def test_empty_and_null_text():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["", None, "   \t  "]),
        }
    )
    r = gopher_rules(t).to_pydict()
    assert r["n_words"] == [0, 0, 0]
    assert r["word_count_ok"] == [False, False, False]
    # vacuous integer bounds on 0 words hold; the pass still fails
    assert r["mean_word_len_ok"] == [True, True, True]
    assert r["gopher_pass"] == [False, False, False]


def test_matches_scalar_reference():
    """Vectorized kernel vs a direct per-doc Python evaluation on a mixed
    corpus including every mutated tier shape from the qdocs fixture."""
    rng = np.random.default_rng(7)
    vocab = ["the", "be", "to", "data", "row", "scan", "x" * 12, "123", "#"]
    docs = []
    for i in range(80):
        n = int(rng.integers(5, 120))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        doc = " ".join(toks)
        if i % 4 == 0:
            doc = doc.replace(" ", "\n- ", 5)
        if i % 5 == 0:
            doc = doc + "..."
        docs.append(doc)
    got = _rules(docs)
    for i, doc in enumerate(docs):
        words = doc.split() if doc.strip() else []
        lines = doc.split("\n")
        n_words = len(words)
        chars = sum(len(w) for w in words)
        hashes = doc.count("#")
        ell_syms = doc.count("...") + doc.count("…")
        bullets = sum(
            any(l.startswith(p) for p in BULLET_PREFIXES) for l in lines
        )
        ells = sum(l.endswith("...") or l.endswith("…") for l in lines)
        alpha = sum(any(c.isascii() and c.isalpha() for c in w) for w in words)
        stops = sum(sw in words for sw in STOP_WORDS)
        assert got["n_words"][i] == n_words
        assert got["word_chars"][i] == chars
        assert got["n_hash_symbols"][i] == hashes
        assert got["n_ellipsis_symbols"][i] == ell_syms
        assert got["n_bullet_lines"][i] == bullets
        assert got["n_ellipsis_lines"][i] == ells
        assert got["n_alpha_words"][i] == alpha
        assert got["n_stop_hits"][i] == stops
        want_pass = (
            MIN_WORDS <= n_words <= 100_000
            and 3 * n_words <= chars <= 10 * n_words
            and 10 * hashes <= n_words
            and 10 * ell_syms <= n_words
            and 10 * bullets <= 9 * len(lines)
            and 10 * ells <= 3 * len(lines)
            and 5 * alpha >= 4 * n_words
            and stops >= 2
        )
        assert got["gopher_pass"][i] == want_pass, i


def test_gopher_full_filter_drops_repetitive_docs(ray_session):
    """Composition check: a doc that passes every SHAPE rule but is
    dominated by one repeated bigram must be dropped by the n-gram
    repetition thresholds; a repeated-line doc by the line thresholds."""
    import ray.data

    from raydedup.gopher import gopher_full_filter

    # GOOD is deliberately repetitive ("running" x55) and must be dropped
    # by the n-gram thresholds; `varied` has 60 distinct words and passes
    varied = "the be " + " ".join(f"word{i:03d}" for i in range(58))
    repetitive = "the be " + " ".join(["spam", "ham"] * 40)  # top-2gram heavy
    dup_lines = "\n".join([varied] * 10)  # dup_line_frac 0.9
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([varied, repetitive, dup_lines, GOOD]),
        }
    )
    out = gopher_full_filter(ray.data.from_arrow(t)).to_pandas()
    assert list(out["doc_id"]) == [1]


def test_gopher_filter_dataset(ray_session):
    import ray.data

    from raydedup.gopher import gopher_filter

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([GOOD, "too short"]),
            "source": pa.array(["a", "b"]),
        }
    )
    out = gopher_filter(
        ray.data.from_arrow(t), keep_cols=("source",)
    ).to_pandas()
    assert list(out["doc_id"]) == [1]
    assert list(out["source"]) == ["a"]


def test_para_repetition_and_full_filter_para_threshold(ray_session):
    """A doc whose text is repeated as a second paragraph has
    dup_para_frac 0.5 and must be dropped by the full filter even though
    its lines and n-grams are within thresholds per paragraph."""
    import ray.data

    from raydedup.gopher import gopher_full_filter
    from raydedup.textstats import para_repetition_signals

    varied = "the be " + " ".join(f"word{i:03d}" for i in range(58))
    dup_para = varied + "\n\n" + varied
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([varied, dup_para]),
        }
    )
    sig = para_repetition_signals(t).to_pydict()
    assert sig["n_paras"] == [1, 2]
    assert sig["dup_para_frac"] == [0.0, 0.5]
    out = gopher_full_filter(ray.data.from_arrow(t)).to_pandas()
    assert list(out["doc_id"]) == [1]
