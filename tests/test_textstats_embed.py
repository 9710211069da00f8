"""Text-analysis + embedding operator tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.embed import quantized_cosine
from raydedup.textstats import fingerprint, lang_id, quality_score, text_stats


def test_text_stats_basic():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["Hello, world! 123", "", "a b  c"]),
        }
    )
    out = text_stats(batch)
    assert out.column("n_tokens").to_pylist() == [3, 0, 3]
    assert out.column("n_chars").to_pylist() == [17, 0, 6]
    pr = out.column("punct_ratio").to_pylist()
    assert pr[0] > 0 and pr[1] == 0.0 and pr[2] == 0.0
    assert out.column("digit_ratio").to_pylist()[0] == 3 / 17


def test_quality_score_range_and_order():
    rich = "the quick brown fox jumps over a lazy dog " * 10
    noisy = "!!! ### $$$ %%% 111 222 &&& *** " * 5
    batch = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array([rich, noisy])}
    )
    out = quality_score(batch)
    q = out.column("quality").to_pylist()
    assert 0.0 <= q[1] < q[0] <= 1.0


def test_lang_id():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat and the dog sat in the garden for a while",
                    "der hund und die katze sind nicht zu hause",
                    "zzz qqq www",
                ]
            ),
        }
    )
    out = lang_id(batch)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "und"]


def test_lang_id_mixed_language_quality():
    """Quality check on a 12-language fixture: every natural-language snippet
    must be identified as its own language, gibberish and empty as 'und'."""
    fixtures = [
        ("en", "the cat and the dog were in the house but it was not for them"),
        ("de", "der hund und die katze sind nicht mit dem kind auf der straße"),
        ("fr", "le chien et le chat sont dans la maison avec les enfants"),
        ("es", "el perro y el gato están en la casa con los niños para jugar"),
        ("it", "il cane e il gatto sono nella casa con i bambini per giocare"),
        ("pt", "o cachorro e o gato não estão em casa com as crianças"),
        ("nl", "de hond en de kat zijn niet in het huis met de kinderen"),
        ("sv", "hunden och katten är inte i huset med barnen för att leka"),
        ("pl", "pies i kot nie są w domu z dziećmi ale to jest dobrze"),
        ("ru", "собака и кошка не в доме с детьми но это хорошо и так"),
        ("tr", "köpek ve kedi evde çocuklarla değil ama bu çok iyi bir şey"),
        ("el", "ο σκύλος και η γάτα δεν είναι στο σπίτι με τα παιδιά"),
        ("und", "zzz qqq www xkcd foobar"),
        ("und", ""),
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(fixtures)), pa.int64()),
            "text": pa.array([t for _, t in fixtures]),
        }
    )
    out = lang_id(batch)
    assert out.column("lang_pred").to_pylist() == [lang for lang, _ in fixtures]


def test_fingerprint_whitespace_stable():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "  a  b   c  ", "a b d"]),
        }
    )
    out = fingerprint(batch)
    fp = out.column("fingerprint").to_pylist()
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_quantized_cosine_deterministic_and_close():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 64)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    c1 = quantized_cosine(a, a)
    c2 = quantized_cosine(a.copy(), a.copy())
    assert np.array_equal(c1, c2)
    assert np.allclose(np.diag(c1), 1.0, atol=1e-5)
    true = a.astype(np.float64) @ a.astype(np.float64).T
    assert np.abs(c1 - true).max() < 1e-4


def test_embedding_lsh_recall_vs_exact(ray_session):
    """LSH mode (n_bits=4, n_tables=16) must reach >=0.95 recall vs the
    exact all-pairs tier at threshold 0.45, with globally unique pairs
    (owner-table rule) and no false positives (cosine is verified)."""
    import ray.data

    from raydedup.embed import embedding_dup_pairs

    sf = "/root/testdata/sf0.001"
    exact = embedding_dup_pairs(
        ray.data.read_parquet(f"{sf}/embeddings.parquet"),
        threshold=0.45, n_bits=0, max_bucket=1 << 20,
    ).to_pandas()
    ex = set(zip(exact["src"], exact["dst"]))
    got = embedding_dup_pairs(
        ray.data.read_parquet(f"{sf}/embeddings.parquet"),
        threshold=0.45, n_bits=4, n_tables=16,
    ).to_pandas()
    g = list(zip(got["src"], got["dst"]))
    assert len(g) == len(set(g)), "duplicate pairs emitted"
    assert len(set(g) - ex) == 0, "false positives"
    assert len(set(g) & ex) / max(len(ex), 1) >= 0.95


def test_embedding_oversize_bucket_star_fallback():
    """Buckets over max_bucket degrade to a representative star, not zero."""
    import numpy as np
    import pyarrow as pa

    from raydedup.embed import make_embedding_block_verifier

    n = 300
    emb = np.tile(np.linspace(0.1, 0.9, 64), (n, 1))
    keys = np.full(n, 5, dtype=np.uint64)
    block = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb)),
            "bucket": pa.array(keys, pa.uint64()),
            "table_idx": pa.array(np.zeros(n, dtype=np.int64)),
            "all_keys": pa.array(
                [keys[:1].astype("<u8").tobytes()] * n, pa.binary(8)
            ),
        }
    )
    verify = make_embedding_block_verifier(threshold=0.9, n_tables=1, max_bucket=100)
    out = verify(block)
    # full star over the WHOLE bucket (every member verified once against
    # the representative), not n*(n-1)/2 and not capped at max_bucket
    assert len(out) == n - 1
    assert (out.column("src").to_numpy() == 0).all()
    assert set(out.column("dst").to_pylist()) == set(range(1, n))


def test_ann_topk_matches_bruteforce(ray_session):
    import ray.data

    from raydedup.embed import ann_topk, quantized_cosine

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    mat = np.stack([np.asarray(v) for v in tbl["embedding"].to_pylist()])
    vids = np.asarray(tbl["vec_id"].to_pylist())
    q = mat[:3]
    qids = vids[:3]
    # small batch size forces many per-batch pre-cuts + combiner merges
    out = ann_topk(
        ray.data.read_parquet(f"{sf}/embeddings.parquet").repartition(8),
        q, qids, k=5,
    ).to_pandas()
    cos = quantized_cosine(mat, q)
    for i, qid in enumerate(qids):
        order = np.lexsort((vids, -cos[:, i]))[:5]
        want = list(vids[order])
        got = list(out[out["query_id"] == qid].sort_values(
            ["cosine", "vec_id"], ascending=[False, True])["vec_id"])
        assert got == want, (qid, got, want)


def test_media_dup_pairs_exact_planted(ray_session):
    """Multimodal composition query: DecodeStage features → hyperplane-LSH
    dedup finds exactly the 16 planted payload duplicates."""
    import __ray_entry__ as entrymod

    out = entrymod.queries()["media_dup_pairs"]("/root/testdata/sf0.001").to_pandas()
    pairs = set(zip(out["src"], out["dst"]))
    want = {(i, 1000 + i) for i in range(16)}
    assert pairs == want


def test_ann_topk_ivf_exact_mode_matches_bruteforce(ray_session):
    """nprobe == n_lists degrades IVF to exact brute force: results must be
    bit-identical to ann_topk (same quantized-cosine IEEE op sequence)."""
    import ray.data

    from raydedup.embed import ann_topk, ann_topk_ivf

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    mat = np.stack([np.asarray(v) for v in tbl["embedding"].to_pylist()])
    vids = np.asarray(tbl["vec_id"].to_pylist())
    q, qids = mat[:3], vids[:3]
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet").repartition(8)
    exact = ann_topk(ds, q, qids, k=5).to_pandas()
    ivf = ann_topk_ivf(ds, q, qids, k=5, n_lists=8, nprobe=8).to_pandas()
    key = ["query_id", "vec_id"]
    exact = exact.sort_values(key).reset_index(drop=True)
    ivf = ivf.sort_values(key).reset_index(drop=True)
    assert exact.equals(ivf)


def test_ann_topk_ivf_recall(ray_session):
    """Approximate mode (nprobe < n_lists) keeps high recall vs exact."""
    import ray.data

    from raydedup.embed import ann_topk, ann_topk_ivf

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    mat = np.stack([np.asarray(v) for v in tbl["embedding"].to_pylist()])
    vids = np.asarray(tbl["vec_id"].to_pylist())
    q, qids = mat[:5], vids[:5]
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    exact = ann_topk(ds, q, qids, k=10).to_pandas()
    ivf = ann_topk_ivf(ds, q, qids, k=10, n_lists=16, nprobe=8).to_pandas()
    hits = tot = 0
    for qid in qids:
        want = set(exact[exact["query_id"] == qid]["vec_id"])
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        hits += len(want & got)
        tot += len(want)
    # offline sweep at sf0.001: nprobe 8/16 → recall 0.9 (half the compute)
    assert hits / tot >= 0.85, hits / tot


def test_token_counts_matches_duckdb_re2():
    import duckdb

    from raydedup.textstats import BPE_TOKEN_PATTERN, token_counts

    texts = [
        "Hello world, it's 2026!",
        "",
        "   ",
        "naïve café #42 — ok",
        "don't stop can't won't I'll we're you've I'm he'd",
        "x" * 100 + "9y z_3",
        "tabs\tand\nnewlines  multiple   spaces",
        None,
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = token_counts(batch)
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "select length(regexp_extract_all(?, ?))", [t or "", BPE_TOKEN_PATTERN]
        ).fetchone()[0]
        assert out.column("bpe_tokens")[i].as_py() == want, texts[i]
    # whitespace convention: empty/null rows count zero
    assert out.column("ws_tokens").to_pylist()[:4] == [4, 0, 0, 5]


def test_token_counts_bpe_splits_contractions_and_numbers():
    from raydedup.textstats import token_counts

    batch = pa.table({"text": ["it's a12b", "hello"]})
    out = token_counts(batch)
    # it|'s| a|12|b = 5 ; hello = 1
    assert out.column("bpe_tokens").to_pylist() == [5, 1]


def test_repetition_signals_vs_bruteforce(ray_session):
    """String-level brute force (collections.Counter over raw lines) vs the
    vectorized hash-based kernel, including empty docs, whitespace-only
    lines (NOT empty — kept), NULL text, and unicode lines."""
    from collections import Counter

    from raydedup.textstats import repetition_signals

    docs = [
        "a\nb\na\nc\na",          # 5 lines, 3 distinct
        "x\n\n\nx\nx",            # empties dropped: 3 lines of 'x'
        "",                        # no lines
        None,                      # NULL
        "solo",                    # 1 line
        "é¼\né¼\nplain",          # unicode dup
        " \n \nâ€‰",                 # whitespace lines are non-empty
        "long line here\nlong line here\nshort",
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    out = repetition_signals(batch)
    for i, doc in enumerate(docs):
        lines = [l for l in (doc or "").split("\n") if l != ""]
        cnt = Counter(lines)
        n = len(lines)
        dup_line = (n - len(cnt)) / max(n, 1)
        total = sum(len(l) for l in lines)
        dup_chars = sum((c - 1) * len(l) for l, c in cnt.items())
        assert out.column("n_lines")[i].as_py() == n
        assert out.column("dup_line_frac")[i].as_py() == np.floor(dup_line * 1e6) / 1e6
        assert out.column("dup_char_frac")[i].as_py() == np.floor(
            dup_chars / max(total, 1) * 1e6
        ) / 1e6
