"""Paragraph/line-level boilerplate removal (CCNet-style, Wenzek et al.
2019 §3.1: "we deduplicate at the paragraph level" by dropping paragraphs
seen many times across the corpus — navigation menus, license banners,
cookie notices). The analog in the reference ecosystem is the frequent-items
"heavy hitters" idea applied to document lines (reference
`frequencies/LongsSketch.java:33-60` motivates the same
count-the-heavy-keys-without-holding-all-keys shape; here the exact global
count is affordable because only lines in >= min_docs documents survive the
filter).

Semantics (mirrored exactly by the DuckDB oracle in __ray_entry__):

* a document's lines are its ``text`` split on ``\n`` (empty text → one
  empty line, matching both Arrow's ``split_pattern`` and DuckDB's
  ``string_split``);
* a NON-EMPTY line is *boilerplate* when it occurs in >= ``min_docs``
  DISTINCT documents (within-document repeats count once);
* output per document: the text with boilerplate lines removed (remaining
  lines re-joined with ``\n``), the original line count, and the number of
  removed lines. Empty lines are never counted or removed.

Scale shape (two streaming passes over the input):

1. **count pass** — ``map_batches`` splits lines, 64-bit-hashes them
   (xxh64, the repo-wide line-identity convention — collisions are
   2^-64-scale and shared with the oracle's exact-string assumption),
   dedups (doc, line) pairs per batch and emits per-batch partial counts
   ``(h, c)``: shuffle volume is 16 B per distinct (doc, line), never the
   text. A hash-partitioned sum (pipeline.grouped_blocks — one vectorized
   call per partition) filters to lines with global count >= min_docs.
   That survivor set is SMALL by construction — at most
   total_lines/min_docs entries — so it is safe to collect and broadcast
   (``ray.put`` once, read zero-copy in every map task) at any corpus
   size where min_docs is a real threshold.
2. **rewrite pass** — ``map_batches`` re-splits each document, drops lines
   whose hash hits the broadcast sorted array (searchsorted — no Python
   per line), and rebuilds the text with one ``pc.binary_join``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import xxh64_flat
from .tokenize import _string_array_np

_LINE_SEED = 0  # shared with textstats.repetition_signals


def _split_lines(text_col) -> tuple[pa.ListArray, pa.StringArray, np.ndarray]:
    """(list-of-lines, flat lines, lines-per-row) for a string column."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    lines = pc.split_pattern(pc.fill_null(text_col, ""), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    per_row = pc.list_value_length(lines).to_numpy().astype(np.int64)
    return lines, lines.flatten(), per_row


def _line_hashes(flat_lines: pa.StringArray) -> tuple[np.ndarray, np.ndarray]:
    """(xxh64 per line, byte-length per line) over the flat buffer."""
    fb, off = _string_array_np(flat_lines)
    h = xxh64_flat(fb, off, seed=_LINE_SEED)
    blen = np.diff(off).astype(np.int64)
    return h, blen


def frequent_line_hashes(
    ds: "ray.data.Dataset",  # noqa: F821 - forward ref; ray imported lazily
    text_col: str = "text",
    min_docs: int = 10,
) -> np.ndarray:
    """Sorted uint64 xxh64 hashes of every non-empty line occurring in
    >= ``min_docs`` distinct documents. Streaming count pass; only the
    (small) survivor set is materialized driver-side."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would drop every line)")
    from .pipeline import grouped_blocks

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, flat, per_row = _split_lines(batch.column(text_col))
        h, blen = _line_hashes(flat)
        doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), per_row)
        keep = blen > 0
        h, doc_idx = h[keep], doc_idx[keep]
        if len(h) == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        # distinct (doc, line) pairs, then per-batch counts per line hash
        order = np.lexsort((h, doc_idx))
        d_s, h_s = doc_idx[order], h[order]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        hu, c = np.unique(h_s[first], return_counts=True)
        return pa.table(
            {
                "h": pa.array(hu.view(np.int64), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def sum_filter(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        h = block.column("h").to_numpy()
        c = block.column("c").to_numpy()
        order = np.argsort(h, kind="stable")
        h_s, c_s = h[order], c[order]
        starts = np.ones(len(h_s), dtype=bool)
        starts[1:] = h_s[1:] != h_s[:-1]
        idx = np.flatnonzero(starts)
        sums = np.add.reduceat(c_s, idx)
        return pa.table({"h": pa.array(h_s[idx][sums >= min_docs], pa.int64())})

    partials = ds.map_batches(partial_counts, batch_format="pyarrow")
    freq_tbl = grouped_blocks(partials, "h", sum_filter)
    # survivor set is <= total_lines/min_docs rows — small by construction
    out = np.concatenate(
        [b.column("h").to_numpy() for b in freq_tbl.iter_batches(batch_format="pyarrow")]
        or [np.array([], np.int64)]
    ).view(np.uint64)
    out.sort()
    return out


def dedup_paragraphs(
    docs: "ray.data.Dataset",  # noqa: F821
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 10,
    frequent: np.ndarray | None = None,
) -> "ray.data.Dataset":  # noqa: F821
    """Remove corpus-frequent lines from every document.

    Returns a Dataset with columns ``(id_col, text_clean, n_lines,
    n_removed)``. ``frequent`` lets a caller reuse a precomputed
    :func:`frequent_line_hashes` set (e.g. built on a sample or a prior
    snapshot); by default the count pass runs on ``docs`` itself.
    """
    import ray

    if frequent is None:
        frequent = frequent_line_hashes(docs, text_col=text_col, min_docs=min_docs)
    freq_ref = ray.put(np.ascontiguousarray(frequent, dtype=np.uint64))

    def rewrite(batch: pa.Table) -> pa.Table:
        freq = ray.get(freq_ref)
        _, flat, per_row = _split_lines(batch.column(text_col))
        h, blen = _line_hashes(flat)
        if len(freq):
            pos = np.minimum(np.searchsorted(freq, h), len(freq) - 1)
            hit = freq[pos] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        drop = hit & (blen > 0)  # empty lines are never boilerplate
        keep = ~drop
        n_rows = batch.num_rows
        kept_per_row = np.zeros(n_rows, dtype=np.int64)
        if len(keep):
            doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), per_row)
            kept_per_row = np.bincount(doc_idx[keep], minlength=n_rows)
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(kept_per_row, out=offsets[1:])
        kept_flat = flat.filter(pa.array(keep))
        rebuilt = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_flat
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_clean": pc.binary_join(rebuilt, "\n"),
                "n_lines": pa.array(per_row, pa.int64()),
                "n_removed": pa.array(per_row - kept_per_row, pa.int64()),
            }
        )

    return docs.map_batches(rewrite, batch_format="pyarrow")
