"""C4 line/page filter (raydedup/c4filter.py) — rule-by-rule crafted
cases plus a scalar brute-force cross-check."""

import numpy as np
import pyarrow as pa

from raydedup.c4filter import (
    BLOCK_SUBSTRINGS,
    c4_page_filter,
)


def _run(texts, ids=None, **kw):
    ids = ids or list(range(len(texts)))
    t = pa.table(
        {"page_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    )
    return c4_page_filter(t, **kw).to_pydict()


GOOD_LINE = "this is a proper sentence with enough words."


def test_line_rules():
    page = "\n".join(
        [
            GOOD_LINE,  # kept
            "no terminal punctuation here",  # dropped: no punct
            "just four words here.",  # dropped: 4 words < 5
            "please enable JavaScript to continue browsing.",  # dropped: js
            'he said "stop right there!"',  # kept: 5 words, ends in quote
            "is this a real question?",  # kept: 5 words
        ]
    )
    r = _run([page], min_sentences=1)
    assert r["n_lines_kept"] == [3]
    kept = r["text_clean"][0].split("\n")
    assert kept == [
        GOOD_LINE,
        'he said "stop right there!"',
        "is this a real question?",
    ]


def test_page_block_substrings():
    for s in BLOCK_SUBSTRINGS:
        page = GOOD_LINE + "\n" + f"some text with {s} inside."
        assert _run([page], min_sentences=1)["page_id"] == []
    # case-insensitive
    assert _run([GOOD_LINE + "\nLOREM IPSUM dolor."], min_sentences=1)[
        "page_id"
    ] == []


def test_min_sentences_counts_kept_text_only():
    # one kept line with one '.', plus a dropped (2-word) line full of '!'
    # marks — sentences must be counted AFTER line filtering
    page = GOOD_LINE + "\n" + "!!! !!!"
    r = _run([page], min_sentences=1)
    assert r["n_sentences"] == [1]
    assert _run([page], min_sentences=2)["page_id"] == []
    multi = "\n".join([GOOD_LINE] * 5)
    assert _run([multi], min_sentences=5)["n_sentences"] == [5]


def test_lines_trimmed_before_rules_and_join():
    page = "   " + GOOD_LINE + "   \n\t another good sentence right here. "
    r = _run([page], min_sentences=1)
    assert r["text_clean"] == [
        GOOD_LINE + "\nanother good sentence right here."
    ]


def test_empty_and_all_dropped_pages():
    r = _run(["", "menu\nnav\nfooter", GOOD_LINE], min_sentences=1)
    assert r["page_id"] == [2]


def test_matches_scalar_reference():
    rng = np.random.default_rng(11)
    frags = [
        GOOD_LINE,
        "short.",
        "no punct line with many words here",
        "uses javascript everywhere on this page.",
        "a fine question to ask?",
        "function f() { return 1; }",
        "Lorem Ipsum filler text here.",
        "menu",
    ]
    pages = []
    for i in range(60):
        k = int(rng.integers(1, 6))
        pages.append("\n".join(frags[int(j)] for j in rng.integers(0, len(frags), k)))
    got = _run(pages, min_sentences=1)
    got_by_id = {
        pid: (tc, nk, ns)
        for pid, tc, nk, ns in zip(
            got["page_id"], got["text_clean"], got["n_lines_kept"], got["n_sentences"]
        )
    }
    import re

    for i, page in enumerate(pages):
        if any(s in page.lower() for s in BLOCK_SUBSTRINGS):
            assert i not in got_by_id
            continue
        kept = []
        for l in page.split("\n"):
            l = l.strip(" \t\n\r\v\f")
            if (
                re.search(r'[.!?"]$', l)
                and len(re.findall(r"\S+", l)) >= 5
                and "javascript" not in l.lower()
            ):
                kept.append(l)
        clean = "\n".join(kept)
        ns = len(re.findall(r"[.!?]", clean))
        if ns >= 1:
            assert got_by_id[i] == (clean, len(kept), ns), i
        else:
            assert i not in got_by_id


def test_c4_filter_dataset(ray_session):
    import ray.data

    from raydedup.c4filter import c4_filter

    t = pa.table(
        {
            "page_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([GOOD_LINE, "menu"]),
        }
    )
    out = c4_filter(
        ray.data.from_arrow(t), min_sentences=1
    ).to_pandas()
    assert list(out["page_id"]) == [1]
