"""URL canonicalization + URL-level dedup — the first dedup tier of a web
crawl pipeline (RefinedWeb/CCNet dedup by normalized URL before any content
tier; the reference analog is the same hashed-key-identity idea as the
exact sha tier, applied to the document's address instead of its bytes).

Canonical form (every rule mirrored EXACTLY by the generated DuckDB SQL —
the regex steps below are shared constants, redact_pii's anti-drift
pattern; both sides are RE2):

* scheme and host lowercased; path/query case preserved;
* ``http`` folded to ``https`` (the same page served on either scheme is
  one page for dedup purposes; default ports are stripped BEFORE the fold
  so ``:80``/``:443`` rules see the original scheme);
* a leading ``www.`` stripped from the host;
* the default port stripped (``:80`` for http, ``:443`` for https);
* the fragment never enters the key (the extraction regex stops at ``#``);
* ``utm_*`` tracking parameters removed, query separators re-tidied;
* a trailing ``/`` stripped (so ``/a/b/`` = ``/a/b`` and the root path
  ``/`` = empty);
* a string that doesn't parse as ``scheme://...`` canonicalizes to itself.

The fixture (:func:`urls_sql`) plants all variant classes over the driver's
``documents`` table — case-mangled scheme/host, explicit default port,
``www.`` prefix, trailing slash, fragments, utm parameters, and a genuine
distinct-query variant that must NOT collapse — with colliding groups of 3
docs (key = doc_id % 300) whose members carry different variants.

Scale shape: canonicalization is stateless vectorized Arrow (extract_regex
+ a fixed replace chain) map-side; the dedup is ONE groupby on the
canonical string (min survivor id + count) — no other shuffle, no driver
state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# scheme :// host[:port] rest-up-to-fragment (fragment excluded by design).
# Named groups: Arrow's extract_regex requires them; RE2 numbers them 1-3
# for DuckDB's regexp_extract(..., i).
URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<rest>[^#]*)"

# ordered (pattern, replacement) steps applied to the REST part, shared
# verbatim with the SQL mirror (both RE2, global):
REST_STEPS: list[tuple[str, str]] = [
    # run of utm params each followed by another param: the [?&] boundary
    # anchor is kept via backref (\1 works in BOTH Arrow's and DuckDB's
    # RE2 rewrite), so a non-utm name like 'xutm_a' or a VALUE containing
    # 'utm_' never matches; the (...)+ repetition handles consecutive utm
    # params in ONE global pass (a replace never rescans its own output);
    # the (=[^&]*)? makes the VALUE optional so a valueless '?utm_source'
    # is stripped too (docstring contract: 'utm_* tracking params removed')
    (r"([?&])(?:utm_[A-Za-z0-9_]*(?:=[^&]*)?&)+", r"\1"),
    (r"[?&]utm_[A-Za-z0-9_]*(?:=[^&]*)?$", ""),  # trailing utm param
    (r"\?&", "?"),                        # tidy '?&a=1' → '?a=1'
    (r"[?&]+$", ""),                      # dangling separators
    (r"/$", ""),                          # trailing slash (root '/' → '')
]
WWW_STEP = (r"^www\.", "")


def canonicalize_urls(url_col) -> pa.Array:
    """Vectorized canonical form of a string column of URLs."""
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    url_col = pc.fill_null(url_col, "")
    parts = pc.extract_regex(url_col, URL_RE)
    matched = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "scheme"), ""))
    host = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "host"), ""))
    host = pc.replace_substring_regex(host, WWW_STEP[0], WWW_STEP[1])
    # default-port strip, scheme-conditional
    host = pc.if_else(
        pc.and_(
            pc.equal(scheme, "http"), pc.match_substring_regex(host, r":80$")
        ),
        pc.replace_substring_regex(host, r":80$", ""),
        host,
    )
    host = pc.if_else(
        pc.and_(
            pc.equal(scheme, "https"), pc.match_substring_regex(host, r":443$")
        ),
        pc.replace_substring_regex(host, r":443$", ""),
        host,
    )
    scheme = pc.if_else(pc.equal(scheme, "http"), pa.scalar("https"), scheme)
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
    for pat, rep in REST_STEPS:
        rest = pc.replace_substring_regex(rest, pat, rep)
    canon = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    return pc.if_else(matched, canon, url_col)


def canonical_url_sql(col: str) -> str:
    """The identical canonicalization as a DuckDB SQL expression —
    generated from the same URL_RE/REST_STEPS constants (cannot drift)."""
    u = f"coalesce({col}, '')"
    scheme = f"lower(regexp_extract({u}, '{URL_RE}', 1))"
    host = f"regexp_replace(lower(regexp_extract({u}, '{URL_RE}', 2)), '{WWW_STEP[0]}', '{WWW_STEP[1]}', 'g')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '', 'g') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '', 'g') "
        f"ELSE {host} END"
    )
    scheme = f"(CASE WHEN {scheme} = 'http' THEN 'https' ELSE {scheme} END)"
    rest = f"regexp_extract({u}, '{URL_RE}', 3)"
    for pat, rep in REST_STEPS:
        # DuckDB '...' literals are not C-escaped: pass RE2 verbatim
        rest = f"regexp_replace({rest}, '{pat}', '{rep}', 'g')"
    return (
        f"CASE WHEN regexp_matches({u}, '{URL_RE}') "
        f"THEN {scheme} || '://' || ({host}) || ({rest}) ELSE {u} END"
    )


def url_dedup_survivors(
    ds: "ray.data.Dataset",  # noqa: F821 - ray imported lazily
    url_col: str = "url",
    id_col: str = "url_id",
) -> "ray.data.Dataset":
    """→ Dataset(canonical_url, survivor_id, n_dups): per canonical URL the
    minimum id (keep-first) and the duplicate-group size. Canonicalize
    map-side, then ONE groupby on the canonical string."""
    from ray.data.aggregate import Count, Min

    def canon(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": canonicalize_urls(batch.column(url_col)),
                id_col: batch.column(id_col),
            }
        )

    agg = (
        ds.select_columns([id_col, url_col])
        .map_batches(canon, batch_format="pyarrow")
        .groupby("canonical_url")
        .aggregate(Min(id_col), Count())
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": batch.column("canonical_url"),
                "survivor_id": pc.cast(
                    batch.column(f"min({id_col})"), pa.int64()
                ),
                "n_dups": pc.cast(batch.column("count()"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic URL fixture over the driver's documents table
# ---------------------------------------------------------------------------


def urls_sql(documents_rel: str = "documents") -> str:
    """A deterministic (url_id, url) view over ``documents`` — the
    SQL-expressed-once fixture pattern (corpus.corpus_sql). Groups of up to
    3 docs share key = doc_id % 300 and differ in variant = doc_id % 7
    (300 ≢ 0 mod 7, so a group's members carry different variants):
    variants 0-3 and 5-6 canonicalize to the group's base URL; variant 4
    keeps a real query string and must stay distinct."""
    return f"""
SELECT doc_id AS url_id,
  CASE doc_id % 7
    WHEN 0 THEN 'https://example' || k || '.com/p' || j || '/page' || k
    WHEN 1 THEN 'HTTP://EXAMPLE' || k || '.COM:80/p' || j || '/page' || k || '?utm_source=feed'
    WHEN 2 THEN 'https://www.example' || k || '.com/p' || j || '/page' || k || '/'
    WHEN 3 THEN 'https://example' || k || '.com/p' || j || '/page' || k || '#frag2'
    WHEN 4 THEN 'https://example' || k || '.com/p' || j || '/page' || k || '?a=1&utm_campaign=x&b=2'
    WHEN 5 THEN 'HTTPS://Example' || k || '.Com:443/p' || j || '/page' || k || '?utm_a=1&utm_b=2'
    ELSE 'https://example' || k || '.com:443/p' || j || '/page' || k
  END AS url
FROM (SELECT doc_id, CAST(doc_id % 300 AS VARCHAR) AS k,
             CAST((doc_id % 300) % 11 AS VARCHAR) AS j
      FROM {documents_rel})
ORDER BY url_id
"""


def urls_parquet_path(sf_dir: str) -> str:
    """Build (once, idempotently) the urls fixture parquet for a testdata
    dir. Concurrent-safe via atomic rename."""
    import os

    from .corpus import SCRATCH_ROOT, _sf_tag

    out_dir = os.path.join(SCRATCH_ROOT, "urls", _sf_tag(sf_dir))
    out = os.path.join(out_dir, "urls.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    tmp = out + f".tmp{os.getpid()}"
    con.execute(f"COPY ({urls_sql()}) TO '{tmp}' (FORMAT PARQUET)")
    os.replace(tmp, out)
    con.close()
    return out
