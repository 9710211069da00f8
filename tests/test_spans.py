"""Exact substring span dedup (raydedup/spans.py) vs a string-level brute
force: keep-first removability, maximal-span merging (overlap AND adjacency),
within-doc repeats, whole-doc copies, short docs, empty/whitespace docs, and
broadcast/join rewrite-mode agreement."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _tokens(text: str | None) -> list[str]:
    t = (text or "").strip(" \t\n\r\v\f")
    return re.split(r"[ \t\n\f\r]+", t)  # RE2 \s (NO \v) — '' → [''] like DuckDB


def _brute_spans(docs: dict[int, str | None], L: int):
    """Removable merged spans [(id, start, end)] and per-doc stripped text
    by exact string logic (1-based token positions, end exclusive)."""
    toks = {i: _tokens(t) for i, t in docs.items()}
    occ: dict[str, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        tl = toks[i]
        if len(tl) < L or tl == [""]:
            continue
        for p in range(1, len(tl) - L + 2):
            occ.setdefault(" ".join(tl[p - 1 : p - 1 + L]), []).append((i, p))
    removable: list[tuple[int, int]] = []
    for sites in occ.values():
        sites.sort()
        removable.extend(sites[1:])
    by_doc: dict[int, list[int]] = {}
    for i, p in removable:
        by_doc.setdefault(i, []).append(p)
    spans = []
    covered: dict[int, set[int]] = {}
    for i, ps in sorted(by_doc.items()):
        ps.sort()
        s = e = None
        for p in ps:
            covered.setdefault(i, set()).update(range(p, p + L))
            if s is None:
                s, e = p, p + L
            elif p <= e:
                e = p + L
            else:
                spans.append((i, s, e))
                s, e = p, p + L
        spans.append((i, s, e))
    stripped = {}
    for i, tl in toks.items():
        cov = covered.get(i, set())
        kept = [t for j, t in enumerate(tl, start=1) if j not in cov]
        stripped[i] = (" ".join(kept), len(tl) - len(kept))
    return sorted(spans), stripped


def _spans_rows(ds) -> list[tuple[int, int, int]]:
    t = ds.to_pandas()
    return sorted(
        zip(t["id"].astype(int), t["span_start"].astype(int), t["span_end"].astype(int))
    )


BASE = " ".join(f"tok{j}" for j in range(30))  # 30 unique tokens


def _fixture_docs() -> dict[int, str | None]:
    rep = " ".join(f"rep{j}" for j in range(22))
    return {
        1: BASE,  # canonical
        2: BASE,  # exact copy → fully stripped
        3: "lead in words " + BASE + " trailing bits here",  # containment
        4: rep + " middle filler words " + rep,  # within-doc repeat
        5: "short words only here now ok fine yes",  # 8 tokens, no windows
        6: "short words only here now ok fine yes",  # short copy — NOT flagged
        7: "",  # empty
        8: "   \t  ",  # whitespace-only
        # adjacent merge: two disjoint copies of BASE back to back
        9: BASE + " " + BASE,
    }


def test_duplicate_spans_matches_bruteforce(ray_session):
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.spans import duplicate_spans

    docs = _fixture_docs()
    L = 20
    want, _ = _brute_spans(docs, L)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(docs), pa.int64()),
                "content": pa.array([docs[i] for i in docs], pa.string()),
            }
        )
    )
    got = _spans_rows(duplicate_spans(ds, window=L, cfg=DEFAULT_CONFIG))
    assert got == want
    flagged = {i for i, _, _ in got}
    assert 2 in flagged and 3 in flagged and 4 in flagged and 9 in flagged
    assert 5 not in flagged and 6 not in flagged  # short docs never flagged
    # doc 2 is a whole-doc copy: single span covering every token
    span2 = [(s, e) for i, s, e in got if i == 2]
    assert span2 == [(1, 31)]


def test_strip_matches_bruteforce_and_modes_agree(ray_session):
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.spans import strip_duplicate_spans

    docs = _fixture_docs()
    L = 20
    _, want = _brute_spans(docs, L)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(docs), pa.int64()),
                "content": pa.array([docs[i] for i in docs], pa.string()),
            }
        )
    )
    outs = {}
    for mode in ("broadcast", "join"):
        t = (
            strip_duplicate_spans(ds, window=L, cfg=DEFAULT_CONFIG, mode=mode)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        outs[mode] = t
        got = {
            int(r["id"]): (r["content"], int(r["n_removed"]))
            for _, r in t.iterrows()
        }
        assert got == want, mode
    assert outs["broadcast"].equals(outs["join"])
    # canonical doc 1 untouched; copy doc 2 fully emptied
    got = {int(r["id"]): r["content"] for _, r in outs["broadcast"].iterrows()}
    assert got[1] == BASE
    assert got[2] == ""
    assert got[7] == "" and got[8] == ""


def test_spans_on_corpus_fixture(ray_session):
    """Engine vs brute force on the real sf0.001 corpus fixture (planted
    exact/near/substring/boilerplate tiers)."""
    import pyarrow.parquet as pq
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.corpus import corpus_parquet_path
    from raydedup.spans import duplicate_spans

    path = corpus_parquet_path("/root/testdata/sf0.001")
    tbl = pq.read_table(path, columns=["id", "content"])
    docs = dict(
        zip(tbl.column("id").to_pylist(), tbl.column("content").to_pylist())
    )
    L = 20
    want, _ = _brute_spans(docs, L)
    ds = ray.data.read_parquet(path, columns=["id", "content"])
    got = _spans_rows(duplicate_spans(ds, window=L, cfg=DEFAULT_CONFIG))
    assert got == want
    assert len(got) > 50  # the planted tiers make this rich


def test_window_explode_positions():
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.spans import WindowExplode

    batch = pa.table(
        {
            "id": pa.array([7, 8], pa.int64()),
            "content": pa.array(["a b c d e", "x y"], pa.string()),
        }
    )
    out = WindowExplode(3, DEFAULT_CONFIG.seed)(batch)
    assert out.column("id").to_pylist() == [7, 7, 7]  # doc 8 too short
    assert out.column("pos").to_pylist() == [1, 2, 3]
    w = out.column("w").to_numpy()
    assert len(np.unique(w)) == 3


def test_strip_with_foreign_spans_filtered_corpus(ray_session):
    """Spans precomputed on a FULL corpus applied to a filtered corpus:
    spans whose id has no doc row must be ignored in BOTH modes (a raw
    searchsorted in join mode used to alias another doc's row)."""
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.spans import duplicate_spans, strip_duplicate_spans

    docs = _fixture_docs()
    L = 20
    full = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(docs), pa.int64()),
                "content": pa.array([docs[i] for i in docs], pa.string()),
            }
        )
    )
    spans = duplicate_spans(full, window=L, cfg=DEFAULT_CONFIG).materialize()
    span_ids = set(spans.to_pandas()["id"])
    assert span_ids  # the fixture plants removable spans
    # filter OUT one doc that carries spans, keep the rest
    dropped = max(span_ids)
    kept_ids = [i for i in docs if i != dropped]
    filtered = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(kept_ids, pa.int64()),
                "content": pa.array([docs[i] for i in kept_ids], pa.string()),
            }
        )
    )
    outs = {}
    for mode in ("broadcast", "join"):
        t = (
            strip_duplicate_spans(
                filtered, window=L, cfg=DEFAULT_CONFIG, spans=spans, mode=mode
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        outs[mode] = t
        assert list(t["id"]) == kept_ids
    # the two modes agree row for row
    assert outs["broadcast"].equals(outs["join"])
