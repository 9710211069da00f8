"""Deterministic synthetic source-corpus construction (FIXTURES.md F1).

The engine's input table — ``(id, repo, path, commit, lang, content)`` per
BASELINE.json input_hint — is synthesized from the driver's ``documents``
table by a construction that is expressed ONCE as ANSI SQL
(:func:`corpus_sql`) and executed identically by the Ray side and the DuckDB
oracle, so dedup queries get exact value-hash oracles. Planted structure:

* base rows      — every document, untouched.
* exact tier     — byte-identical copies under different (repo, path)
                   (doc_id % 11 == 0).
* near tiers     — append-suffix (%7==1), token-replace (%7==2),
                   prefix (%7==3) mutations → MinHash/LSH tier.
* substring tier — concatenation of two documents (%13==4) → a verbatim
                   full-document block inside unrelated content.
* boilerplate    — a fixed 40-token license header prepended (%5==0) →
                   hot LSH buckets (skew/salting exercise).

For throughput benchmarks, :func:`amplified_corpus_path` replicates each
document with seeded token mutations to arbitrary row counts (numpy,
deterministic, no SQL mirror needed).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

LICENSE_HEADER = (
    "licensed to the apache software foundation asf under one or more "
    "contributor license agreements see the notice file distributed with "
    "this work for additional information regarding copyright ownership "
    "the asf licenses this file to you under the apache license version"
)  # 40 tokens, fixed

SCRATCH_ROOT = "/tmp/raydedup"


def corpus_sql(documents_rel: str = "documents") -> str:
    """The canonical corpus construction as a SQL SELECT over ``documents``.

    Runnable by DuckDB with ``documents`` registered as a view; mirrored
    exactly by :func:`build_corpus` (which executes this very string).
    """
    return f"""
WITH base AS (
  SELECT doc_id, text, lang FROM {documents_rel}
), n AS (
  SELECT COUNT(*) AS cnt FROM base
)
SELECT id, repo, path, "commit", lang, content FROM (
  SELECT doc_id AS id,
         'org' || CAST(doc_id % 7 AS VARCHAR) || '/repo' || CAST(doc_id % 23 AS VARCHAR) AS repo,
         'src/f' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         substr(sha256('base' || text), 1, 40) AS "commit",
         lang, text AS content
  FROM base
  UNION ALL
  SELECT doc_id + 100000,
         'org' || CAST((doc_id + 3) % 7 AS VARCHAR) || '/repo' || CAST((doc_id + 5) % 23 AS VARCHAR),
         'copy/f' || CAST(doc_id AS VARCHAR) || '.txt',
         substr(sha256('copy' || text), 1, 40),
         lang, text
  FROM base WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 200000,
         'org' || CAST((doc_id + 1) % 7 AS VARCHAR) || '/repo' || CAST((doc_id + 7) % 23 AS VARCHAR),
         'near_a/f' || CAST(doc_id AS VARCHAR) || '.txt',
         substr(sha256('neara' || text), 1, 40),
         lang, text || ' zero one two three four'
  FROM base WHERE doc_id % 7 = 1
  UNION ALL
  SELECT doc_id + 300000,
         'org' || CAST((doc_id + 2) % 7 AS VARCHAR) || '/repo' || CAST((doc_id + 11) % 23 AS VARCHAR),
         'near_r/f' || CAST(doc_id AS VARCHAR) || '.txt',
         substr(sha256('nearr' || text), 1, 40),
         lang, replace(text, ' the ', ' teh ')
  FROM base WHERE doc_id % 7 = 2
  UNION ALL
  SELECT doc_id + 400000,
         'org' || CAST((doc_id + 4) % 7 AS VARCHAR) || '/repo' || CAST((doc_id + 13) % 23 AS VARCHAR),
         'near_p/f' || CAST(doc_id AS VARCHAR) || '.txt',
         substr(sha256('nearp' || text), 1, 40),
         lang, 'prefix alpha beta gamma delta ' || text
  FROM base WHERE doc_id % 7 = 3
  UNION ALL
  SELECT d.doc_id + 500000,
         'org' || CAST((d.doc_id + 5) % 7 AS VARCHAR) || '/repo' || CAST((d.doc_id + 17) % 23 AS VARCHAR),
         'subs/f' || CAST(d.doc_id AS VARCHAR) || '.txt',
         substr(sha256('subs' || d.text), 1, 40),
         d.lang, d.text || ' ' || o.text
  FROM base d JOIN base o
    ON o.doc_id = (d.doc_id + 101) % (SELECT cnt FROM n)
  WHERE d.doc_id % 13 = 4
  UNION ALL
  SELECT doc_id + 600000,
         'org' || CAST((doc_id + 6) % 7 AS VARCHAR) || '/repo' || CAST((doc_id + 19) % 23 AS VARCHAR),
         'boiler/f' || CAST(doc_id AS VARCHAR) || '.txt',
         substr(sha256('boiler' || text), 1, 40),
         lang, '{LICENSE_HEADER} ' || text
  FROM base WHERE doc_id % 5 = 0
) ORDER BY id
"""


def _sf_tag(sf_dir: str) -> str:
    """Cache tag for a testdata dir: readable basename + a digest of the
    FULL absolute path, so two different dirs that share a basename (e.g.
    /a/sf0.01 and /b/sf0.01) never share a cache entry."""
    import hashlib

    norm = os.path.abspath(os.path.normpath(sf_dir))
    digest = hashlib.sha256(norm.encode()).hexdigest()[:10]
    base = os.path.basename(norm) or "sf"
    return f"{base}-{digest}"


def corpus_parquet_path(sf_dir: str) -> str:
    """Build (once, idempotently) and return the corpus parquet path for a
    testdata dir. Concurrent-safe via atomic rename."""
    out_dir = os.path.join(SCRATCH_ROOT, "corpus", _sf_tag(sf_dir))
    out = os.path.join(out_dir, "corpus.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    tmp = out + f".tmp{os.getpid()}"
    con.execute(f"COPY ({corpus_sql()}) TO '{tmp}' (FORMAT PARQUET)")
    os.replace(tmp, out)
    con.close()
    return out


def corpus_table(sf_dir: str):
    import pyarrow.parquet as pq

    return pq.read_table(corpus_parquet_path(sf_dir))


# ---------------------------------------------------------------------------
# Amplified corpus for throughput benchmarks (deterministic numpy mutations)
# ---------------------------------------------------------------------------

_VOCAB_EXTRA = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon",
]


def amplified_corpus_path(
    sf_dir: str, replicas: int, seed: int = 42, shard_rows: int = 50_000
) -> str:
    """Build (once) a large corpus: each document plus ``replicas`` mutated
    variants. Written as multiple parquet shards (resumable layout). Returns
    the directory path.

    Replicas are organized into sub-clusters of ~9 so dup-cluster sizes stay
    CONSTANT as the corpus grows (otherwise pair counts grow quadratically
    with the amplification factor, which no real corpus does):
      * sub-cluster base = heavy mutation of the doc (~40% token churn →
        J << threshold vs other sub-clusters),
      * members = light mutations of the sub-cluster base (J ≈ 0.8-0.98),
      * every 7th member = exact copy of the sub-cluster base.
    """
    out_dir = os.path.join(
        SCRATCH_ROOT, "amplified", f"{_sf_tag(sf_dir)}_x{replicas}_s{seed}_v2"
    )
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs["doc_id"].to_numpy()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    n = len(texts)

    rows_id: list[int] = []
    rows_repo: list[str] = []
    rows_path: list[str] = []
    rows_commit: list[str] = []
    rows_lang: list[str] = []
    rows_content: list[str] = []
    shard = 0

    def flush() -> None:
        nonlocal shard, rows_id, rows_repo, rows_path, rows_commit, rows_lang, rows_content
        if not rows_id:
            return
        tbl = pa.table(
            {
                "id": pa.array(rows_id, pa.int64()),
                "repo": rows_repo,
                "path": rows_path,
                "commit": rows_commit,
                "lang": rows_lang,
                "content": rows_content,
            }
        )
        pq.write_table(tbl, os.path.join(out_dir, f"part-{shard:05d}.parquet"))
        shard += 1
        rows_id, rows_repo, rows_path = [], [], []
        rows_commit, rows_lang, rows_content = [], [], []

    def add(i: int, tag: str, content: str, lang: str) -> None:
        rows_id.append(i)
        rows_repo.append(f"org{i % 7}/repo{i % 23}")
        rows_path.append(f"{tag}/f{i}.txt")
        rows_commit.append(hashlib.sha256((tag + content).encode()).hexdigest()[:40])
        rows_lang.append(lang)
        rows_content.append(content)
        if len(rows_id) >= shard_rows:
            flush()

    for d in range(n):
        add(int(doc_ids[d]), "base", texts[d], langs[d])
    next_id = 10_000_000
    sub_size = 9
    for d in range(n):
        toks = texts[d].split(" ")
        sub_base: list[str] | None = None
        sub_idx = -1
        for r in range(replicas):
            s = r // sub_size
            if s != sub_idx:
                # new sub-cluster: heavy mutation → unrelated to siblings
                rng = np.random.default_rng((seed, int(doc_ids[d]), 777_000 + s))
                sub_base = [
                    _VOCAB_EXTRA[int(rng.integers(len(_VOCAB_EXTRA)))]
                    if rng.random() < 0.4
                    else t
                    for t in toks
                ]
                rng.shuffle(sub_base)
                sub_idx = s
            rng = np.random.default_rng((seed, int(doc_ids[d]), r))
            if r % 7 == 0:
                content = " ".join(sub_base)
            else:
                del_rate = rng.uniform(0.02, 0.08)
                sub_rate = rng.uniform(0.0, 0.05)
                keep = rng.random(len(sub_base)) >= del_rate
                out_toks = [t for t, k in zip(sub_base, keep) if k]
                subs = rng.random(len(out_toks)) < sub_rate
                for j in np.flatnonzero(subs):
                    out_toks[j] = _VOCAB_EXTRA[int(rng.integers(len(_VOCAB_EXTRA)))]
                content = " ".join(out_toks)
            add(next_id, f"rep{r}", content, langs[d])
            next_id += 1
    flush()
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
