"""Gopher within-document n-GRAM repetition signals (Rae et al. 2021
Appendix A1.1) — the other half of the repetition filter family:
:func:`raydedup.textstats.repetition_signals` covers the duplicate-LINE
fractions; this module covers the word-n-gram ones every MassiveText
descendant (Dolma, DataTrove/FineWeb) re-implements:

* for n in {2, 3, 4}: ``top_{n}gram_char_frac`` — the fraction of the
  document's characters contained in the occurrences of its single most
  frequent n-gram;
* for n in {5..10}: ``dup_{n}gram_char_frac`` — the fraction of the
  document's characters covered by n-grams that occur more than once
  (positions covered by overlapping duplicate occurrences are counted
  ONCE — the standard de-overlapped definition).

Exact shared semantics (mirrored by the generated DuckDB oracle):

* tokens: repo-rule ASCII-trim + ``\\s+`` split; positions 1..T;
* an n-gram exists at p iff p+n-1 <= T (docs with T < n have none);
* an n-gram's character length = Σ token code-point lengths + (n-1)
  joining spaces;
* the document denominator = Σ token lengths + (T-1) — the length of the
  canonical single-spaced text (whitespace-run invariant);
* "most frequent" ties break to the LARGER n-gram char length; any
  remaining tie is between grams with equal (count, length), which yield
  the same fraction, so the value is well-defined;
* duplicate coverage counts TOKEN characters only (not the joining
  spaces), each covered position once;
* fractions floor-quantized to 1e-6 (the repo's bit-exact float
  convention); empty docs score 0 everywhere.

n-gram identity is xxh64 over the token byte images (the repo-wide
hashed-stream convention, reference theta/UpdateSketch.java:220-324);
the oracle assumes exact strings — collisions are 2^-64-scale.

Scale shape: stateless ``map_batches`` — no shuffle. Per batch: ONE
split, ONE flat token hash pass, then per n one sliding-window hash
(fixed-stride vectorized), one lexsort, and one diff-array coverage
cumsum. No Python per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .gopher import _flat_words
from .hashing import xxh64_flat, xxh64_u64s
from .tokenize import _string_array_np

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)
_Q = 1e6

# Gopher Table A1 removal thresholds: a document is removed when a signal
# EXCEEDS its threshold (filters keep frac <= threshold)
TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def ngram_repetition_signals(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_docs = len(text)

    flat_w, t_counts = _flat_words(pc.fill_null(text, ""))
    lens = pc.utf8_length(flat_w).to_numpy(zero_copy_only=False).astype(np.int64)
    fb, off = _string_array_np(flat_w)
    tok_h = xxh64_flat(fb, off, seed=0)
    total = len(tok_h)
    row_off = np.concatenate([[0], np.cumsum(t_counts)]).astype(np.int64)
    row_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), t_counts)
    clen = np.concatenate([[0], np.cumsum(lens)])
    denom = np.maximum(
        clen[row_off[1:]] - clen[row_off[:-1]] + np.maximum(t_counts - 1, 0), 1
    ).astype(np.float64)

    cols: dict = {id_col: batch.column(id_col)}

    for n in TOP_NS + DUP_NS:
        if total >= n:
            starts = np.arange(total - n + 1, dtype=np.int64)
            row_of_start = row_of_tok[starts]
            valid = starts + n <= row_off[row_of_start + 1]
            starts = starts[valid]
        else:
            starts = np.zeros(0, dtype=np.int64)
        if len(starts) == 0:
            frac = np.zeros(n_docs, dtype=np.float64)
            key = (
                f"top_{n}gram_char_frac" if n in TOP_NS else f"dup_{n}gram_char_frac"
            )
            cols[key] = pa.array(frac, pa.float64())
            continue
        rows = row_of_tok[starts]
        from numpy.lib.stride_tricks import sliding_window_view

        grams = xxh64_u64s(sliding_window_view(tok_h, n)[starts], seed=0)
        glen = (clen[starts + n] - clen[starts] + (n - 1)).astype(np.int64)

        order = np.lexsort((grams, rows))
        r_s, g_s = rows[order], grams[order]
        run_start = np.ones(len(order), dtype=bool)
        run_start[1:] = (r_s[1:] != r_s[:-1]) | (g_s[1:] != g_s[:-1])
        run_idx = np.flatnonzero(run_start)
        run_cnt = np.diff(np.concatenate([run_idx, [len(order)]]))
        run_row = r_s[run_idx]
        run_len = glen[order][run_idx]  # all occurrences share the length

        if n in TOP_NS:
            # per doc: max (count, gramlen) lexicographic via packed key
            key64 = run_cnt.astype(np.uint64) << np.uint64(32) | run_len.astype(
                np.uint64
            )
            doc_start = np.ones(len(run_row), dtype=bool)
            doc_start[1:] = run_row[1:] != run_row[:-1]
            seg = np.flatnonzero(doc_start)
            best = np.maximum.reduceat(key64, seg)
            top_num = np.zeros(n_docs, dtype=np.float64)
            top_num[run_row[seg]] = (best >> np.uint64(32)).astype(np.float64) * (
                best & np.uint64(0xFFFFFFFF)
            ).astype(np.float64)
            frac = np.floor(top_num / denom * _Q) / _Q
            cols[f"top_{n}gram_char_frac"] = pa.array(frac, pa.float64())
        else:
            # occurrences of grams with count >= 2 cover [start, start+n)
            dup_occ = np.repeat(run_cnt >= 2, run_cnt)
            occ_starts = starts[order][dup_occ]
            cover = np.zeros(total + 1, dtype=np.int64)
            np.add.at(cover, occ_starts, 1)
            np.add.at(cover, occ_starts + n, -1)
            covered = np.cumsum(cover[:-1]) > 0
            dup_chars = np.bincount(
                row_of_tok[covered], weights=lens[covered], minlength=n_docs
            )
            frac = np.floor(dup_chars / denom * _Q) / _Q
            cols[f"dup_{n}gram_char_frac"] = pa.array(frac, pa.float64())

    return pa.table(cols)
