"""BPE merge-pair counting — the inner counting step of byte-pair-encoding
tokenizer training (Sennrich et al. 2016): the global frequency of every
adjacent character pair inside whitespace tokens, over all token
OCCURRENCES (a word seen a million times contributes its pairs a million
times — exactly the statistic the first BPE merge is chosen from).

Semantics (mirrored exactly by the DuckDB oracle in __ray_entry__):

* tokens: the repo-wide ws_tokens convention (ASCII trim + ``\\s+`` split,
  empty docs contribute nothing);
* pairs: for every token occurrence of character length >= 2, the
  CHARACTER pairs ``token[i:i+2]`` for i = 1..len-1 (codepoint semantics —
  DuckDB's ``substr``/``length``);
* output: every pair with global count >= ``min_count`` (a threshold, not
  a top-k, so the result set is tie-stable by construction).

Scale shape: one pass, one narrow shuffle. map_batches explodes tokens
into per-batch DISTINCT pair partial counts (the combiner — shuffle volume
is per-batch pair-vocab x ~14 B, never the token stream), then a
hash-partitioned vectorized sum (pipeline.grouped_blocks) filters to the
threshold. ASCII tokens take a zero-copy numpy fast path (2-byte windows
over the flat UTF-8 buffer viewed as uint16 — for ASCII, byte pairs ARE
character pairs); tokens containing multibyte codepoints fall back to a
per-token Python loop, bounded by the non-ASCII share of the batch.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from .tokenize import _string_array_np
from .vocab import _ws_tokens

DEFAULT_MIN_COUNT = 3


def _pair_partials(content_col) -> tuple[list[str], np.ndarray]:
    """Per-batch (distinct pair strings, counts) over all token
    occurrences."""
    flat, _ = _ws_tokens(content_col)
    fb, off = _string_array_np(flat)
    lens = np.diff(off)
    n_tok = len(lens)
    if n_tok == 0:
        return [], np.zeros(0, np.int64)
    # ASCII fast path: tokens whose bytes are all < 0x80
    nonascii_flags = np.zeros(n_tok, dtype=bool)
    if len(fb):
        hi = fb >= 0x80
        if hi.any():
            tok_of_byte = (
                np.searchsorted(off, np.flatnonzero(hi), side="right") - 1
            )
            nonascii_flags[np.unique(tok_of_byte)] = True
    counts: Counter = Counter()
    ascii_idx = np.flatnonzero(~nonascii_flags & (lens >= 2))
    if len(ascii_idx):
        pair_cnt = lens[ascii_idx] - 1
        total = int(pair_cnt.sum())
        seg = np.concatenate([[0], np.cumsum(pair_cnt)])[:-1]
        pos = (
            np.repeat(off[:-1][ascii_idx], pair_cnt)
            + np.arange(total, dtype=np.int64)
            - np.repeat(seg, pair_cnt)
        )
        codes = fb[pos].astype(np.uint16) << 8 | fb[pos + 1].astype(np.uint16)
        uniq, c = np.unique(codes, return_counts=True)
        pair_bytes = np.empty((len(uniq), 2), dtype=np.uint8)
        pair_bytes[:, 0] = uniq >> 8
        pair_bytes[:, 1] = uniq & 0xFF
        for pb, cc in zip(pair_bytes, c):
            counts[pb.tobytes().decode("ascii")] += int(cc)
    for i in np.flatnonzero(nonascii_flags):
        s = fb[off[i] : off[i + 1]].tobytes().decode("utf-8")
        if len(s) >= 2:
            counts.update(s[j : j + 2] for j in range(len(s) - 1))
    if not counts:
        return [], np.zeros(0, np.int64)
    pairs = list(counts.keys())
    return pairs, np.fromiter(counts.values(), dtype=np.int64, count=len(pairs))


def bpe_pair_counts(
    corpus: "ray.data.Dataset",  # noqa: F821 - ray imported lazily
    content_col: str = "content",
    min_count: int = DEFAULT_MIN_COUNT,
) -> "ray.data.Dataset":
    """→ Dataset(pair: string, pair_count: int64) — adjacent character
    pairs inside tokens with global occurrence count >= ``min_count``."""
    from .pipeline import grouped_blocks

    def partials(batch: pa.Table) -> pa.Table:
        pairs, c = _pair_partials(batch.column(content_col))
        return pa.table(
            {
                "p": pa.array(pairs, pa.string()),
                "c": pa.array(c, pa.int64()),
            }
        )

    def sum_filter(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "pair_count": pa.array([], pa.int64()),
                }
            )
        agg = block.group_by("p").aggregate([("c", "sum")])
        import pyarrow.compute as pc

        keep = pc.greater_equal(agg.column("c_sum"), min_count)
        agg = agg.filter(keep)
        return pa.table(
            {
                "pair": agg.column("p"),
                "pair_count": pc.cast(agg.column("c_sum"), pa.int64()),
            }
        )

    return grouped_blocks(
        corpus.map_batches(partials, batch_format="pyarrow"), "p", sum_filter
    )
