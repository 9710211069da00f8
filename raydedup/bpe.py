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


# ---------------------------------------------------------------------------
# Full BPE training (iterated merges) + apply
# ---------------------------------------------------------------------------
#
# Classic word-level BPE (Sennrich et al. 2016): train on the WORD-FREQUENCY
# table, not the token stream — the standard scale shape (the corpus is read
# ONCE to build the word vocab; every merge round is a pass over the much
# smaller vocab table). Each round:
#
#   1. map_batches over the encoded word table → per-batch pair partial
#      counts (pair packed as int64 l<<32|r, weighted by word count);
#   2. ONE small groupby("p").sum — global pair counts (pair vocab sized,
#      never corpus sized);
#   3. per-block exact top-M (keys are globally unique after the groupby,
#      so block-top union ⊇ global top) → driver picks the best pair:
#      highest count, then lexicographically smallest (left, right) —
#      deterministic, mirrored by the SQL oracle's ORDER BY c DESC, l, r;
#   4. map_batches applies the merge to every word's symbol sequence
#      (vectorized on the flat int32 id array) → materialized next state.
#
# ``merges_per_round > 1`` is the bounded-rounds scale knob: pick up to K
# pairs per round greedily from the sorted candidates, subject to symbol-
# DISJOINTNESS (merging (a,b) only changes counts of pairs touching a or b,
# so disjoint merges in one round are order-independent and their selection
# counts stay exact). K=1 is exact classic BPE and is what the SQL oracle
# mirrors.
#
# Overlap rule within one merge application (run of 'aaa' merging (a,a)):
# greedy left-to-right non-overlapping — keep the 1st, 3rd, ... match of
# each consecutive run; identical in the engine kernel, the scalar
# reference (tests), and the SQL oracle's row_number()%2 filter.


def word_counts(
    corpus: "ray.data.Dataset",  # noqa: F821
    content_col: str = "content",
) -> "ray.data.Dataset":
    """→ Dataset(w: string, cnt: int64) — whitespace-token occurrence
    counts over the corpus (ws_tokens convention). One narrow shuffle of
    per-batch distinct-token partials."""
    from .pipeline import grouped_blocks

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, _ = _ws_tokens(batch.column(content_col))
        # _ws_tokens adjusts per-row counts for empty docs but leaves the
        # lone "" token in the flat array — drop it here
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table(
                {"w": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table(
            {
                "w": g.column("w"),
                "c": g.column("count_all").cast(pa.int64()),
            }
        )

    def sum_block(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if block.num_rows == 0:
            return pa.table(
                {"w": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        agg = block.group_by("w").aggregate([("c", "sum")])
        return pa.table(
            {"w": agg.column("w"), "cnt": pc.cast(agg.column("c_sum"), pa.int64())}
        )

    return grouped_blocks(
        corpus.map_batches(partials, batch_format="pyarrow"), "w", sum_block
    )


def _batch_alphabet(words) -> list[str]:
    """Distinct characters over a batch of word strings (ASCII bytes
    vectorized; non-ASCII words via Python set, bounded by their share)."""
    fb, off = _string_array_np(words)
    lens = np.diff(off)
    chars: set[str] = set()
    if len(fb):
        base, end = int(off[0]), int(off[-1])
        seg = fb[base:end]
        ascii_bytes = np.unique(seg[seg < 0x80])
        chars.update(chr(b) for b in ascii_bytes)
        if (seg >= 0x80).any():
            hi_pos = np.flatnonzero(fb >= 0x80)
            rows = np.unique(np.searchsorted(off, hi_pos, side="right") - 1)
            for i in rows:
                s = fb[off[i] : off[i + 1]].tobytes().decode("utf-8")
                chars.update(s)
    return sorted(chars)


def _encode_words_batch(words, char2id: dict) -> tuple[np.ndarray, np.ndarray]:
    """Word strings → (flat int32 symbol ids, word offsets). ASCII words
    take a vectorized LUT path; multibyte words fall back per word."""
    import pyarrow.compute as pc

    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n = len(words)
    n_chars = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    coff = np.zeros(n + 1, np.int64)
    np.cumsum(n_chars, out=coff[1:])
    out = np.empty(int(coff[-1]), dtype=np.int32)
    fb, boff = _string_array_np(words)
    blens = np.diff(boff)
    is_ascii = blens == n_chars
    lut = np.full(0x80, -1, dtype=np.int32)
    for ch, i in char2id.items():
        cp = ord(ch)
        if cp < 0x80:
            lut[cp] = i
    a_idx = np.flatnonzero(is_ascii & (n_chars > 0))
    if len(a_idx):
        cnt = n_chars[a_idx]
        total = int(cnt.sum())
        seg = np.zeros(len(a_idx), np.int64)
        np.cumsum(cnt, out=seg[0:])  # inclusive; shift below
        seg = np.concatenate([[0], seg[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(seg, cnt)
        src = np.repeat(boff[:-1][a_idx], cnt) + local
        dst = np.repeat(coff[:-1][a_idx], cnt) + local
        out[dst] = lut[fb[src]]
    for i in np.flatnonzero(~is_ascii):
        s = fb[boff[i] : boff[i + 1]].tobytes().decode("utf-8")
        out[coff[i] : coff[i + 1]] = [char2id[c] for c in s]
    if (out < 0).any() and len(a_idx):
        bad = np.flatnonzero(out < 0)
        raise KeyError(f"character not in alphabet at flat position {bad[0]}")
    return out, coff


def _list_col_flat_i32(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 values, offsets) of a list<int32>/large_list<int32>
    column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    flat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.int32)
    # a sliced list array keeps the FULL values buffer with absolute
    # offsets — normalize to a base-0 view so downstream index math holds
    base, end = int(off[0]), int(off[-1])
    return flat[base:end], off - base


def _syms_list_array(flat: np.ndarray, off: np.ndarray) -> pa.Array:
    return pa.LargeListArray.from_arrays(
        pa.array(off, pa.int64()), pa.array(flat, pa.int32())
    )


def _pair_partial_counts(
    flat: np.ndarray, off: np.ndarray, cnts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (pair code l<<32|r, weighted count) over adjacent
    within-word symbol pairs (overlap-inclusive, the classic statistic)."""
    n = len(flat)
    if n < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lens = np.diff(off - off[0])
    word_rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = word_rep[:-1] == word_rep[1:]
    if not valid.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    codes = (flat[:-1].astype(np.int64) << 32) | flat[1:].astype(np.int64)
    codes = codes[valid]
    wts = cnts[word_rep[:-1][valid]]
    order = np.argsort(codes, kind="quicksort")
    cs, ws = codes[order], wts[order]
    bound = np.ones(len(cs), bool)
    bound[1:] = cs[1:] != cs[:-1]
    idx = np.flatnonzero(bound)
    return cs[idx], np.add.reduceat(ws, idx)


def _apply_merge_flat(
    flat: np.ndarray, off: np.ndarray, l: int, r: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right non-overlapping merge of adjacent (l, r) →
    new_id within each word segment; returns the new (flat, offsets)."""
    off = off - off[0]
    n = len(flat)
    if n < 2:
        return flat, off
    lens = np.diff(off)
    word_rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    m = (flat[:-1] == l) & (flat[1:] == r) & (word_rep[:-1] == word_rep[1:])
    pos = np.flatnonzero(m)
    if pos.size == 0:
        return flat, off
    if l == r and pos.size > 1:
        newrun = np.ones(pos.size, bool)
        newrun[1:] = pos[1:] != pos[:-1] + 1
        rid = np.cumsum(newrun) - 1
        first = np.zeros(int(rid[-1]) + 1, dtype=np.int64)
        first[rid[newrun]] = np.flatnonzero(newrun)
        keep = ((np.arange(pos.size) - first[rid]) % 2) == 0
        pos = pos[keep]
    out = flat.copy()
    out[pos] = new_id
    del_mask = np.zeros(n, bool)
    del_mask[pos + 1] = True
    new_flat = out[~del_mask]
    dec = np.bincount(word_rep[pos], minlength=len(lens)).astype(np.int64)
    new_off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens - dec, out=new_off[1:])
    return new_flat, new_off


def train_bpe(
    corpus: "ray.data.Dataset",  # noqa: F821
    n_merges: int,
    content_col: str = "content",
    min_count: int = 1,
    merges_per_round: int = 1,
) -> dict:
    """Train word-level BPE over the corpus. Returns
    ``{"merges": [(l_str, r_str), ...], "symbols": [...],
    "merge_rows": [{rank, lhs, rhs, merged, pair_count}, ...],
    "word_table": Dataset(w, cnt, syms)}``.

    ``merges_per_round=1`` is exact classic BPE (what the SQL oracle
    mirrors); K>1 merges up to K symbol-disjoint pairs per counting round
    (their counts are mutually unaffected, so each selected pair's count
    is exact at selection time) — the bounded-rounds knob for large
    vocabularies.
    """
    import ray
    from ray.data.aggregate import Sum

    wc = word_counts(corpus, content_col).materialize()

    # alphabet: distinct chars, sorted (deterministic id assignment)
    def alpha(batch: pa.Table) -> pa.Table:
        return pa.table({"ch": pa.array(_batch_alphabet(batch.column("w")), pa.string())})

    chars = sorted(
        {
            c
            for b in wc.map_batches(alpha, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
            for c in b.column("ch").to_pylist()
        }
    )
    symbols: list[str] = list(chars)
    char2id = {c: i for i, c in enumerate(symbols)}

    def encode(batch: pa.Table) -> pa.Table:
        flat, off = _encode_words_batch(batch.column("w"), char2id)
        return pa.table(
            {
                "w": batch.column("w"),
                "cnt": batch.column("cnt"),
                "syms": _syms_list_array(flat, off),
            }
        )

    enc = wc.map_batches(encode, batch_format="pyarrow").materialize()

    merges: list[tuple[str, str]] = []
    merge_rows: list[dict] = []
    while len(merges) < n_merges:
        k_want = min(merges_per_round, n_merges - len(merges))
        top_m = 4 * k_want + 4  # candidate margin for the disjointness scan
        sym_snapshot = list(symbols)

        def partials(batch: pa.Table) -> pa.Table:
            flat, off = _list_col_flat_i32(batch.column("syms"))
            cnts = batch.column("cnt").to_numpy()
            codes, c = _pair_partial_counts(flat, off, cnts)
            return pa.table(
                {"p": pa.array(codes, pa.int64()), "c": pa.array(c, pa.int64())}
            )

        agg = (
            enc.map_batches(partials, batch_format="pyarrow")
            .groupby("p")
            .aggregate(Sum("c"))
        )

        def block_top(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"p": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            p = batch.column("p").to_numpy()
            c = batch.column("sum(c)").to_numpy().astype(np.int64)
            sym_arr = np.array(sym_snapshot)
            l_str = sym_arr[(p >> 32).astype(np.int64)]
            r_str = sym_arr[(p & 0xFFFFFFFF).astype(np.int64)]
            order = np.lexsort((r_str, l_str, -c))[:top_m]
            return pa.table(
                {"p": pa.array(p[order], pa.int64()), "c": pa.array(c[order], pa.int64())}
            )

        cand = agg.map_batches(block_top, batch_format="pyarrow").take_all()
        if not cand:
            break
        p_all = np.array([r["p"] for r in cand], dtype=np.int64)
        c_all = np.array([r["c"] for r in cand], dtype=np.int64)
        ok = c_all >= min_count
        p_all, c_all = p_all[ok], c_all[ok]
        if len(p_all) == 0:
            break
        sym_arr = np.array(symbols)
        l_ids = (p_all >> 32).astype(np.int64)
        r_ids = (p_all & 0xFFFFFFFF).astype(np.int64)
        order = np.lexsort((sym_arr[r_ids], sym_arr[l_ids], -c_all))
        chosen: list[tuple[int, int, int, int]] = []  # (l, r, new_id, count)
        used: set[int] = set()
        for j in order:
            if len(chosen) >= k_want:
                break
            li, ri = int(l_ids[j]), int(r_ids[j])
            if li in used or ri in used:
                continue
            new_id = len(symbols)
            symbols.append(symbols[li] + symbols[ri])
            used.add(li)
            used.add(ri)
            used.add(new_id)
            chosen.append((li, ri, new_id, int(c_all[j])))
        if not chosen:
            break
        for li, ri, nid, cc in chosen:
            merges.append((sym_snapshot[li], sym_snapshot[ri]))
            merge_rows.append(
                {
                    "rank": len(merges),
                    "lhs": sym_snapshot[li],
                    "rhs": sym_snapshot[ri],
                    "merged": symbols[nid],
                    "pair_count": cc,
                }
            )

        def apply_round(batch: pa.Table, _chosen=tuple(chosen)) -> pa.Table:
            flat, off = _list_col_flat_i32(batch.column("syms"))
            for li, ri, nid, _ in _chosen:
                flat, off = _apply_merge_flat(flat, off, li, ri, nid)
            return pa.table(
                {
                    "w": batch.column("w"),
                    "cnt": batch.column("cnt"),
                    "syms": _syms_list_array(flat, off),
                }
            )

        enc = enc.map_batches(apply_round, batch_format="pyarrow").materialize()

    return {
        "merges": merges,
        "symbols": symbols,
        "merge_rows": merge_rows,
        "word_table": enc,
    }


def bpe_train_table(
    corpus: "ray.data.Dataset",  # noqa: F821
    n_merges: int,
    content_col: str = "content",
    min_count: int = 1,
) -> pa.Table:
    """→ pa.Table(rank, lhs, rhs, merged, pair_count) — the learned merge
    table (exact classic BPE, merges_per_round=1)."""
    res = train_bpe(corpus, n_merges, content_col, min_count, merges_per_round=1)
    rows = res["merge_rows"]
    return pa.table(
        {
            "rank": pa.array([r["rank"] for r in rows], pa.int64()),
            "lhs": pa.array([r["lhs"] for r in rows], pa.string()),
            "rhs": pa.array([r["rhs"] for r in rows], pa.string()),
            "merged": pa.array([r["merged"] for r in rows], pa.string()),
            "pair_count": pa.array([r["pair_count"] for r in rows], pa.int64()),
        }
    )


def bpe_word_tokenization(
    word_table: "ray.data.Dataset",  # noqa: F821
    symbols: list[str],
) -> "ray.data.Dataset":
    """Final train state → Dataset(w, bpe, n_syms): per distinct word the
    space-joined BPE symbol string and symbol count."""
    import pyarrow.compute as pc

    sym_arr = np.array(symbols)

    def decode(batch: pa.Table) -> pa.Table:
        flat, off = _list_col_flat_i32(batch.column("syms"))
        strs = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()),
            pa.array(sym_arr[flat]),  # numpy unicode → pa.string
        )
        return pa.table(
            {
                "w": batch.column("w"),
                "bpe": pc.cast(pc.binary_join(strs, " "), pa.string()),
                "n_syms": pa.array(np.diff(off), pa.int64()),
            }
        )

    return word_table.map_batches(decode, batch_format="pyarrow")


def _collect_word_table(
    train_result: dict, with_bpe: bool
) -> tuple[np.ndarray, "np.ndarray | None", np.ndarray]:
    """Driver-side collection of the trained word→segmentation table,
    sorted by word for searchsorted lookup: (words, bpes-or-None, n_syms).
    Shared by :func:`tokenize_with_merges` and :func:`bpe_encode_docs` so
    the broadcast-prep logic cannot drift between them. The table is
    bounded by the corpus vocabulary (the train-side invariant)."""
    wt = bpe_word_tokenization(train_result["word_table"], train_result["symbols"])
    parts = [b for b in wt.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return (
            np.array([], dtype=str),
            np.array([], dtype=object) if with_bpe else None,
            np.zeros(0, np.int64),
        )
    t = pa.concat_tables(parts)
    words = np.array(t.column("w").to_pylist())
    bpes = (
        np.array(t.column("bpe").to_pylist(), dtype=object) if with_bpe else None
    )
    nsyms = t.column("n_syms").to_numpy().astype(np.int64)
    order = np.argsort(words)
    return (
        words[order],
        bpes[order] if with_bpe else None,
        nsyms[order],
    )


def _lookup(
    w_arr: np.ndarray, toks: np.ndarray, strict: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """(indices of ``toks`` in the sorted vocabulary ``w_arr``, hit mask).

    strict=True (the default apply-time contract since round 4: BPE was
    trained on a different corpus — train on a superset or pre-filter
    instead of silently mis-counting) raises KeyError on any
    out-of-vocabulary token. strict=False returns hit=False rows for the
    caller to handle explicitly (tokenize counts them 0, encode passes
    the word through unsegmented) — the opt-in migration path for
    pre-round-4 lenient callers."""
    idx = np.searchsorted(w_arr, toks)
    idx = np.clip(idx, 0, max(len(w_arr) - 1, 0))
    hit = w_arr[idx] == toks if len(w_arr) else np.zeros(len(toks), bool)
    if strict and not hit.all():
        missing = toks[~hit][:3]
        raise KeyError(
            f"tokens not in the trained vocabulary: {missing.tolist()}"
        )
    return idx, hit


def tokenize_with_merges(
    corpus: "ray.data.Dataset",  # noqa: F821
    train_result: dict,
    content_col: str = "content",
    id_col: str = "id",
    strict: bool = True,
) -> "ray.data.Dataset":
    """Apply a trained BPE to documents → Dataset(id, n_bpe): per document
    the total BPE symbol count over its tokens. The word→n_syms table is
    broadcast ONCE (ray.put) and looked up map-side by searchsorted — no
    shuffle of the corpus. Documents with zero tokens report 0.
    Out-of-vocabulary tokens raise KeyError by default (the same contract
    as :func:`bpe_encode_docs` — a silent 0 count would corrupt token
    budgets downstream); ``strict=False`` restores the pre-round-4
    lenient behavior of counting OOV tokens as 0."""
    import ray

    words, _, nsyms = _collect_word_table(train_result, with_bpe=False)
    ref = ray.put((words, nsyms))

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w_arr, n_arr = ray.get(ref)
        flat, per_row = _ws_tokens(batch.column(content_col))
        # drop the lone "" tokens of empty docs (per_row already excludes
        # them), keeping flat aligned with the per-row repeat below
        flat = flat.filter(pc.not_equal(flat, ""))
        toks = np.array(flat.to_pylist())
        n = batch.num_rows
        out = np.zeros(n, np.int64)
        if len(toks):
            idx, hit = _lookup(w_arr, toks, strict)
            row_of = np.repeat(np.arange(n, dtype=np.int64), per_row)
            np.add.at(out, row_of, np.where(hit, n_arr[idx], 0))
        return pa.table(
            {
                "id": batch.column(id_col),
                "n_bpe": pa.array(out, pa.int64()),
            }
        )

    return corpus.select_columns([id_col, content_col]).map_batches(
        score, batch_format="pyarrow"
    )


def bpe_encode_docs(
    corpus: "ray.data.Dataset",  # noqa: F821
    train_result: dict,
    content_col: str = "content",
    id_col: str = "id",
    strict: bool = True,
) -> "ray.data.Dataset":
    """Apply a trained BPE to documents → Dataset(id, bpe_text, n_bpe):
    the space-joined BPE symbol sequence of the whole document (tokens in
    order, each segmented by the learned merges) plus the symbol count —
    the actual tokenize step a training-data pipeline feeds to packing.

    The word→segmentation table is broadcast ONCE (ray.put, sorted string
    arrays) and applied map-side by searchsorted — no corpus shuffle, no
    per-round work at apply time. Documents with zero tokens yield an
    empty string. Out-of-vocabulary tokens raise KeyError by default;
    ``strict=False`` passes an OOV word through unsegmented (the word
    itself as one symbol, n_bpe contribution 1)."""
    import pyarrow.compute as pc

    import ray

    words, bpes, nsyms = _collect_word_table(train_result, with_bpe=True)
    ref = ray.put((words, bpes, nsyms))

    def encode(batch: pa.Table) -> pa.Table:
        w_arr, b_arr, n_arr = ray.get(ref)
        flat, per_row = _ws_tokens(batch.column(content_col))
        flat = flat.filter(pc.not_equal(flat, ""))  # empty-doc "" tokens
        toks = np.array(flat.to_pylist())
        n = batch.num_rows
        if len(toks):
            idx, hit = _lookup(w_arr, toks, strict)
            seg = b_arr[idx]
            counts = n_arr[idx]
            if not hit.all():
                miss = ~hit
                seg = seg.copy()
                seg[miss] = toks[miss]  # unsegmented pass-through
                counts = np.where(hit, counts, 1)
        else:
            seg = np.array([], dtype=object)
            counts = np.zeros(0, np.int64)
        off = np.zeros(n + 1, np.int64)
        np.cumsum(per_row, out=off[1:])
        lst = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pa.array(seg.tolist(), pa.string())
        )
        out_counts = np.zeros(n, np.int64)
        if len(counts):
            np.add.at(out_counts, np.repeat(np.arange(n, dtype=np.int64), per_row), counts)
        return pa.table(
            {
                "id": batch.column(id_col),
                "bpe_text": pc.cast(pc.binary_join(lst, " "), pa.string()),
                "n_bpe": pa.array(out_counts, pa.int64()),
            }
        )

    return corpus.select_columns([id_col, content_col]).map_batches(
        encode, batch_format="pyarrow"
    )
