"""Document chunking — fixed-size overlapping token windows, the standard
pre-embedding / context-window packing step (split each document into
``window``-token chunks every ``stride`` tokens; stride < window gives the
overlap that keeps boundary-spanning content retrievable).

Semantics (mirrored exactly by the DuckDB oracle in __ray_entry__):

* tokens: the repo-wide ws_tokens convention (ASCII trim + ``\\s+``
  split); empty/whitespace-only docs produce no chunks;
* chunk starts: 1, 1+stride, 1+2·stride, … while start <= n_tokens
  (DuckDB's ``generate_series(1, n, stride)``), so the tail is always
  covered by a final (possibly short) chunk;
* a chunk holds the ``window`` tokens from its start position (fewer for
  the tail chunk), joined with single spaces (token-normalized, the
  spans.py convention) — DuckDB's 1-based INCLUSIVE ``tl[s : s+window-1]``
  slice, i.e. Python's ``tokens[s-1 : s-1+window]``; ``chunk_id`` =
  (start-1)/stride; ``n_tokens`` = the chunk's actual token count.

Scale shape: embarrassingly parallel — one stateless ``map_batches``, no
shuffle; the per-batch kernel is a single gather over the flat token
buffer + one ``pc.binary_join`` (no Python per doc or per chunk).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .vocab import _ws_tokens


def chunk_documents(
    docs: "ray.data.Dataset",  # noqa: F821 - ray imported lazily
    window: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ Dataset(id_col, chunk_id, n_tokens, text) — one row per chunk."""
    if window < 1 or stride < 1 or stride > window:
        raise ValueError("need 1 <= stride <= window")

    def chunk(batch: pa.Table) -> pa.Table:
        flat, per_row = _ws_tokens(batch.column(text_col))
        n = batch.num_rows
        # flat INCLUDES empty docs' lone '' token; per_row excludes it —
        # rebuild the raw flat offsets so gathers stay aligned
        raw = np.where(per_row == 0, 1, per_row)
        tok_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(raw, out=tok_off[1:])
        n_chunks = (np.maximum(per_row - 1, 0) // stride + 1) * (per_row > 0)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        doc_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        seg = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(seg, n_chunks)
        start = chunk_idx * stride  # 0-based within doc
        length = np.minimum(window, per_row[doc_of] - start)
        # gather flat token indices for every chunk
        out_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(length, out=out_off[1:])
        gather = (
            np.repeat(tok_off[doc_of] + start, length)
            + np.arange(int(out_off[-1]), dtype=np.int64)
            - np.repeat(out_off[:-1], length)
        )
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        toks = flat.take(pa.array(gather, pa.int64()))
        lists = pa.LargeListArray.from_arrays(
            pa.array(out_off, pa.int64()), toks
        )
        ids = batch.column(id_col).to_numpy()
        return pa.table(
            {
                id_col: pa.array(ids[doc_of], pa.int64()),
                "chunk_id": pa.array(chunk_idx, pa.int64()),
                "n_tokens": pa.array(length.astype(np.int64), pa.int64()),
                "text": pc.cast(pc.binary_join(lists, " "), pa.string()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        chunk, batch_format="pyarrow"
    )
