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
