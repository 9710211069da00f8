"""Reference-implementation oracles for the queries() entries that are NOT
SQL-expressible (xxh64/simhash are not available in DuckDB): the engine
analog of the reference's golden-binary conformance corpus
(src/test/resources/*.sk). Each test runs the REAL queries() callable at
sf0.001 and compares against an independent scalar implementation
(tests/reference_impls.py) or an exhaustive brute force.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.reference_impls import shingle_set, xxh64

SF_DIR = "/root/testdata/sf0.001"


def _ref_shingle_list(tokens: list[str], k: int, seed: int) -> list[int]:
    """Multiset shingle-hash stream (engine shingle_hashes semantics:
    all windows, not deduped; short rows → one whole-row shingle)."""
    th = [xxh64(t.encode(), seed) for t in tokens]
    if not th:
        return []
    windows = [th] if len(th) < k else [th[i : i + k] for i in range(len(th) - k + 1)]
    return [
        xxh64(b"".join(x.to_bytes(8, "little") for x in w), seed) for w in windows
    ]


def _ref_simhash(shingles: list[int]) -> int:
    """Charikar SimHash over the shingle multiset: bit i set iff a strict
    majority of shingle hashes have bit i set (2*ones > count)."""
    if not shingles:
        return 0
    cnt = len(shingles)
    fp = 0
    for bit in range(64):
        ones = sum((s >> bit) & 1 for s in shingles)
        if 2 * ones > cnt:
            fp |= 1 << bit
    return fp


@pytest.fixture(scope="module")
def corpus_tbl():
    from raydedup.corpus import corpus_parquet_path

    return pq.read_table(corpus_parquet_path(SF_DIR))


def test_doc_fingerprints_match_reference(ray_session):
    import __ray_entry__ as entrymod

    out = entrymod.queries()["doc_fingerprints"](SF_DIR)
    df = out.to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    sample = list(texts)[::20]  # every 20th doc
    assert len(sample) >= 20
    for did in sample:
        norm = " ".join((texts[did] or "").split())
        assert int(df.loc[did, "fingerprint"]) == xxh64(norm.encode(), 0), did


def test_minhash_signatures_match_reference(ray_session, corpus_tbl):
    import __ray_entry__ as entrymod

    cfg = entrymod._cfg()
    out = entrymod.queries()["minhash_signatures"](SF_DIR)
    df = out.to_pandas().set_index("id")
    contents = dict(
        zip(corpus_tbl["id"].to_pylist(), corpus_tbl["content"].to_pylist())
    )
    sample = sorted(contents)[::37]  # ~25 spread across tiers
    assert len(sample) >= 20
    for did in sample:
        content = contents[did] or ""
        toks = content.split()
        row = df.loc[did]
        assert row["sha256"] == hashlib.sha256(content.encode()).hexdigest()
        assert int(row["n_tokens"]) == len(toks)
        assert int(row["n_shingles"]) == len(
            shingle_set(toks, cfg.shingle_k, cfg.seed)
        )
        assert int(row["simhash"]) == _ref_simhash(
            _ref_shingle_list(toks, cfg.shingle_k, cfg.seed)
        )


def test_simhash_dup_pairs_match_bruteforce(ray_session, corpus_tbl):
    """Pigeonhole banding must return EXACTLY the brute-force pair set at
    this scale (d=3 <= n_chunks-1, no bucket near the ceiling), each pair
    exactly once (owner-chunk rule)."""
    import __ray_entry__ as entrymod

    from raydedup.simhash import popcount64
    from raydedup.stages import SignatureStage

    out = entrymod.queries()["simhash_dup_pairs"](SF_DIR).to_pandas()
    got = sorted(zip(out["src"], out["dst"], out["hamming"]))
    assert len(got) == len(set(got)), "duplicate pairs emitted"

    sigs = SignatureStage(entrymod._cfg())(corpus_tbl)
    nsh = sigs.column("n_shingles").to_numpy()
    ids = sigs.column("id").to_numpy()[nsh > 0]
    sim = sigs.column("simhash").to_numpy().astype(np.uint64)[nsh > 0]
    order = np.argsort(ids)
    ids, sim = ids[order], sim[order]
    ia, ib = np.triu_indices(len(ids), k=1)
    ham = popcount64(sim[ia] ^ sim[ib])
    m = ham <= 3
    want = sorted(zip(ids[ia[m]], ids[ib[m]], ham[m]))
    assert got == want
