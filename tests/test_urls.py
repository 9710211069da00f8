"""URL canonicalization + dedup (raydedup/urls.py): rule-level expected
strings, Arrow/DuckDB expression parity, and survivor-selection brute force
over the deterministic fixture."""

from __future__ import annotations

import pyarrow as pa

CASES = [
    # (raw, canonical)
    ("https://example5.com/p5/page5", "https://example5.com/p5/page5"),
    ("HTTP://EXAMPLE5.COM:80/p5/page5?utm_source=feed", "https://example5.com/p5/page5"),
    ("https://www.example5.com/p5/page5/", "https://example5.com/p5/page5"),
    ("https://example5.com/p5/page5#frag2", "https://example5.com/p5/page5"),
    ("https://example5.com/p5/page5?a=1&utm_campaign=x&b=2", "https://example5.com/p5/page5?a=1&b=2"),
    ("HTTPS://Example5.Com:443/p5/page5?utm_a=1&utm_b=2", "https://example5.com/p5/page5"),
    ("https://example5.com:443/p5/page5", "https://example5.com/p5/page5"),
    ("http://host.com:443/x", "https://host.com:443/x"),  # non-default port kept
    ("https://h.com/", "https://h.com"),  # root path stripped
    ("https://h.com", "https://h.com"),
    ("ftp://Files.Example.com/A/B/", "ftp://files.example.com/A/B"),  # path case kept
    ("not a url at all", "not a url at all"),  # unparseable → itself
    (None, ""),
    # utm boundary regressions: a non-utm name containing 'utm_' and a
    # VALUE containing 'utm_' must never be spliced (review finding)
    ("https://h.com/p?xutm_a=1&b=2", "https://h.com/p?xutm_a=1&b=2"),
    ("https://h.com/p?a=utm_b=1&c=2", "https://h.com/p?a=utm_b=1&c=2"),
    # consecutive utm runs, leading / middle / trailing
    ("https://h.com/p?utm_a=1&utm_b=2&utm_c=3", "https://h.com/p"),
    ("https://h.com/p?a=1&utm_b=2&utm_c=3&d=4", "https://h.com/p?a=1&d=4"),
    ("https://h.com/p?utm_a=1&b=2&utm_c=3", "https://h.com/p?b=2"),
    # valueless utm params (round-3 ADVICE): '?utm_source' with no '=' is
    # a tracking param too and must be stripped in every position
    ("https://h.com/p?utm_source", "https://h.com/p"),
    ("https://h.com/p?utm_source&a=1", "https://h.com/p?a=1"),
    ("https://h.com/p?a=1&utm_source", "https://h.com/p?a=1"),
    ("https://h.com/p?utm_a&utm_b=2&c=3&utm_d", "https://h.com/p?c=3"),
    # ...but a non-utm valueless param survives
    ("https://h.com/p?flag&a=1", "https://h.com/p?flag&a=1"),
]


def test_canonicalize_rules():
    from raydedup.urls import canonicalize_urls

    got = canonicalize_urls(pa.array([c[0] for c in CASES], pa.string())).to_pylist()
    assert got == [c[1] for c in CASES]


def test_sql_expression_parity():
    """The generated DuckDB expression agrees with the Arrow kernel on
    every rule case (both RE2; generated from the same constants)."""
    import duckdb

    from raydedup.urls import canonical_url_sql, canonicalize_urls

    raw = [c[0] for c in CASES]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(raw)))
    sql = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('url')} FROM t ORDER BY i"
        ).fetchall()
    ]
    arrow = canonicalize_urls(pa.array(raw, pa.string())).to_pylist()
    assert sql == arrow


def test_url_dedup_survivors_fixture(ray_session):
    import ray.data

    from raydedup.urls import canonicalize_urls, url_dedup_survivors, urls_parquet_path

    path = urls_parquet_path("/root/testdata/sf0.001")
    ds = ray.data.read_parquet(path)
    got = url_dedup_survivors(ds).to_pandas()

    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    canon = canonicalize_urls(tbl.column("url")).to_pylist()
    ids = tbl.column("url_id").to_pylist()
    brute: dict[str, list[int]] = {}
    for i, c in zip(ids, canon):
        brute.setdefault(c, []).append(i)
    want = sorted((c, min(v), len(v)) for c, v in brute.items())
    have = sorted(
        zip(got["canonical_url"], got["survivor_id"].astype(int), got["n_dups"].astype(int))
    )
    assert have == want
    # the fixture plants real duplicate groups (different variants, one page)
    assert max(n for _, _, n in have) >= 2
    assert sum(1 for _, _, n in have if n >= 2) > 50
