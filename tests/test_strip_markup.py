"""Markup extraction (raydedup/textstats.py strip_markup): script/style
content removal, tag stripping, whitespace collapse — vs hand-computed
expectations and a DuckDB regexp_replace mirror."""

from __future__ import annotations

import pyarrow as pa


CASES = [
    ("<p>hello <b>world</b></p>", "hello world"),
    ("<script>var x = 1;\nalert('<p>not text</p>');</script>after", "after"),
    ("<style type='text/css'>p { color: red }</style>body", "body"),
    ("pre<div\nclass='x'>in</div>post", "pre in post"),
    ("no markup at all", "no markup at all"),
    ("  \t spaced \n\n out  ", "spaced out"),
    ("<SCRIPT>upper not matched</SCRIPT>x", "upper not matched x"),  # case-sensitive: tags stripped, content kept
    (None, ""),
    ("", ""),
    ("<p>unicode — ありがとう</p>", "unicode — ありがとう"),
]


def test_strip_markup_cases():
    from raydedup.textstats import strip_markup

    t = pa.table(
        {
            "page_id": pa.array(range(len(CASES)), pa.int64()),
            "html": [c[0] for c in CASES],
        }
    )
    out = strip_markup(t)
    assert out.column("text_clean").to_pylist() == [c[1] for c in CASES]
    assert out.column("n_chars").to_pylist() == [len(c[1]) for c in CASES]
    assert out.column_names == ["page_id", "text_clean", "n_chars"]


def test_strip_markup_matches_duckdb_mirror():
    """The engine and a DuckDB regexp_replace chain built from the SAME
    MARKUP_PATTERNS agree on every case (both sides RE2)."""
    import duckdb

    from raydedup.textstats import MARKUP_PATTERNS, strip_markup

    t = pa.table(
        {
            "page_id": pa.array(range(len(CASES)), pa.int64()),
            "html": [c[0] for c in CASES],
        }
    )
    got = strip_markup(t).column("text_clean").to_pylist()
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    expr = "coalesce(html, '')"
    for pattern, repl in MARKUP_PATTERNS:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT trim({expr}, {ws}) FROM t ORDER BY page_id"
        ).fetchall()
    ]
    assert got == want
