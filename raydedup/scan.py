"""Distributed ordered prefix-scan and token-budget shard packing.

The missing wide primitive for training-data prep: a GLOBAL running total in
a defined row order ("how many tokens precede this document?"), which Ray
Data has no operator for. The classic two-pass exclusive-scan decomposition
keeps it one-shuffle and driver-light:

1. ``sort(order_col)`` — the single all-to-all; the sorted dataset is
   materialized so both later passes observe the SAME block structure.
2. Pass A reads one tiny summary row per block (first order key + block
   sum); the driver folds those into per-block exclusive offsets — O(blocks)
   driver state, never O(rows).
3. Pass B re-maps each block: local vectorized cumsum + its broadcast
   offset. Blocks never exchange data.

At 100 TB the cost profile is exactly one sort plus two streaming map
passes; the driver round trips kilobytes. The order key must be UNIQUE
(offsets key on each block's first order value; ties that straddle blocks
would be ambiguous) — doc ids satisfy this.

``pack_token_shards`` applies the scan to training-shard assignment: docs
ordered by id, shard_id = exclusive-token-cumsum // budget — i.e. the shard
in which each document's token stream STARTS when the corpus is concatenated
and cut at exact budget boundaries (the usual LLM pre-training layout).
Token counts reuse textstats.token_counts' BPE-ish pre-tokenizer, so the
whole operator is SQL-expressible: a window SUM mirrors the scan bit-for-bit
(oracle in __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def ordered_prefix_sum(
    ds: "ray.data.Dataset",
    order_col: str,
    value_col: str,
    out_col: str = "cum_exclusive",
) -> "ray.data.Dataset":
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order.

    Appends ``out_col`` = sum of all STRICTLY EARLIER rows' values. The
    order key must be unique across the dataset. Integer value columns scan
    in exact int64; float columns in float64 (the usual FP-associativity
    caveat applies to the float path).
    """
    ds = ds.sort(order_col).materialize()

    s = ds.schema()
    val_type = dict(zip(s.names, s.types))[value_col]
    sum_type = pa.int64() if pa.types.is_integer(val_type) else pa.float64()

    def _summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"first_key": pa.array([], b.schema.field(order_col).type),
                 "total": pa.array([], sum_type)}
            )
        vals = b.column(value_col).to_numpy(zero_copy_only=False)
        total = int(vals.sum()) if sum_type == pa.int64() else float(vals.sum())
        return pa.table(
            {
                # type the key explicitly: list inference would pick int64
                # and overflow on uint64 keys > 2^63 (shuffle keys)
                "first_key": pa.array(
                    [b.column(order_col)[0].as_py()],
                    b.schema.field(order_col).type,
                ),
                "total": pa.array([total], sum_type),
            }
        )

    # one row per block; blocks of a sorted dataset are key ranges, so
    # sorting the summaries by first_key reproduces block order without
    # relying on take_all ordering
    rows = ds.map_batches(_summary, batch_size=None, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["first_key"])
    offsets: dict = {}
    running = 0
    for r in rows:
        offsets[r["first_key"]] = running
        running += r["total"]
    off_ref = ray.put(offsets)

    def _apply(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], sum_type))
        off = ray.get(off_ref)[b.column(order_col)[0].as_py()]
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        v = v.astype(np.int64 if sum_type == pa.int64() else np.float64)
        cum = off + np.cumsum(v) - v
        return b.append_column(out_col, pa.array(cum, sum_type))

    return ds.map_batches(_apply, batch_size=None, batch_format="pyarrow")


def global_ranks_with_count(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    out_rank: str = "rank",
    out_pct: str = "pct_rank",
) -> tuple["ray.data.Dataset", int]:
    """(:func:`global_ranks` result, total row count) — exposes the row
    total the rank scan already computed so callers that need n (e.g.
    integer tercile boundaries) don't pay an extra execution of the rank
    map just to count rows. Split from ``global_ranks`` so neither
    function's return type depends on a flag."""
    return _global_ranks_impl(ds, value_col, id_col, out_rank, out_pct)


def global_ranks(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    out_rank: str = "rank",
    out_pct: str = "pct_rank",
) -> "ray.data.Dataset":
    """Exact SQL ``rank()`` / ``percent_rank()`` over the WHOLE dataset
    (ORDER BY value_col): rank = 1 + count of strictly smaller values,
    pct = (rank-1)/(n-1). The training-data use is percentile-normalizing a
    quality score before thresholding.

    Same two-pass scan shape as ordered_prefix_sum — one sort, O(blocks)
    driver state — plus exact tie handling across block boundaries: rows
    equal to a block's first value may continue a run from earlier blocks,
    so each block reports its trailing-tie count and the driver chains runs
    in block order (a tie run spanning whole blocks keeps accumulating).
    ``value_col`` must not contain NaN/NULL (NaN breaks both sort order and
    the block-offset key equality).
    """
    return _global_ranks_impl(ds, value_col, id_col, out_rank, out_pct)[0]


def _global_ranks_impl(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    out_rank: str = "rank",
    out_pct: str = "pct_rank",
) -> tuple["ray.data.Dataset", int]:
    sorted_ds = ds.sort([value_col, id_col]).materialize()
    n_total = sorted_ds.count()

    def _summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "first_val": pa.array([], b.schema.field(value_col).type),
                    "first_id": pa.array([], b.schema.field(id_col).type),
                    "last_val": pa.array([], b.schema.field(value_col).type),
                    "count": pa.array([], pa.int64()),
                    "n_tail": pa.array([], pa.int64()),
                }
            )
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        n_tail = int((v == v[-1]).sum())  # sorted: trailing run length
        return pa.table(
            {
                "first_val": [b.column(value_col)[0].as_py()],
                "first_id": [b.column(id_col)[0].as_py()],
                "last_val": [b.column(value_col)[-1].as_py()],
                "count": pa.array([b.num_rows], pa.int64()),
                "n_tail": pa.array([n_tail], pa.int64()),
            }
        )

    rows = sorted_ds.map_batches(
        _summary, batch_size=None, batch_format="pyarrow"
    ).take_all()
    rows.sort(key=lambda r: (r["first_val"], r["first_id"]))
    info: dict = {}
    running = 0
    tie_val = None
    tie_run = 0
    for r in rows:
        eq_before = tie_run if (running and r["first_val"] == tie_val) else 0
        info[(r["first_val"], r["first_id"])] = (running, eq_before)
        homogeneous = r["first_val"] == r["last_val"]
        if homogeneous and running and tie_val == r["first_val"]:
            tie_run += r["count"]
        else:
            tie_run = r["n_tail"]
        tie_val = r["last_val"]
        running += r["count"]
    info_ref = ray.put(info)

    def _apply(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_rank, pa.array([], pa.int64())).append_column(
                out_pct, pa.array([], pa.float64())
            )
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        off, eq_before = ray.get(info_ref)[
            (b.column(value_col)[0].as_py(), b.column(id_col)[0].as_py())
        ]
        local_less = np.searchsorted(v, v, side="left")
        rank = off + local_less + 1
        if eq_before:
            rank = rank - np.where(v == v[0], eq_before, 0)
        pct = (
            (rank - 1) / (n_total - 1)
            if n_total > 1
            else np.zeros(len(v), dtype=np.float64)
        )
        return b.append_column(out_rank, pa.array(rank, pa.int64())).append_column(
            out_pct, pa.array(np.asarray(pct, dtype=np.float64), pa.float64())
        )

    ranked = sorted_ds.map_batches(
        _apply, batch_size=None, batch_format="pyarrow"
    )
    return ranked, n_total


def pack_token_shards(
    docs: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_kind: str = "bpe_tokens",
) -> "ray.data.Dataset":
    """Assign each document to the training shard where its token stream
    starts: shard_id = (tokens before this doc, in id order) // budget.

    Returns (id_col, n_tokens, shard_id). ``token_kind`` picks the
    textstats.token_counts convention ("bpe_tokens" or "ws_tokens").
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from raydedup.textstats import token_counts

    toks = docs.map_batches(
        lambda b: token_counts(b, text_col=text_col).select([id_col, token_kind]),
        batch_format="pyarrow",
    )
    scanned = ordered_prefix_sum(toks, id_col, token_kind)

    def _finish(b: pa.Table) -> pa.Table:
        cum = b.column("cum_exclusive").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_tokens": b.column(token_kind),
                "shard_id": pa.array(cum // budget, pa.int64()),
            }
        )

    return scanned.map_batches(_finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic global shuffle → shard/position assignment
# ---------------------------------------------------------------------------

# Knuth MMIX LCG constants: odd multiplier ⇒ the map id → id*M + C (mod 2^64)
# is a BIJECTION, so shuffle keys are unique whenever ids are — the
# uniqueness ordered_prefix_sum requires — and the SQL mirror can replay it
# exactly with HUGEINT arithmetic (no floating point, no library hash).
SHUFFLE_MULT = 6364136223846793005
SHUFFLE_INC = 1442695040888963407


def shuffle_key_u64(ids: np.ndarray) -> np.ndarray:
    """ids → deterministic pseudo-random uint64 permutation keys."""
    return ids.astype(np.uint64) * np.uint64(SHUFFLE_MULT) + np.uint64(
        SHUFFLE_INC
    )


def shuffle_key_sql(col: str) -> str:
    """The identical key as a DuckDB expression (HUGEINT mod 2^64)."""
    return (
        f"(CAST({col} AS HUGEINT) * {SHUFFLE_MULT} + {SHUFFLE_INC}) "
        f"% 18446744073709551616"
    )


def deterministic_shuffle_shards(
    ds: "ray.data.Dataset",
    id_col: str = "id",
    shard_rows: int = 1000,
) -> "ray.data.Dataset":
    """→ Dataset(id, shard, pos): a DETERMINISTIC global shuffle of the
    corpus cut into fixed-size shards — the training-data ordering step
    (a reproducible random order beats ray's random_shuffle when the run
    must be resumable/auditable: the permutation is a pure function of the
    id, so a re-run or a downstream consumer can recompute any row's
    position without storing the permutation).

    shard = global_shuffle_position // shard_rows, pos = position %
    shard_rows. Cost: exactly ONE sort (on the bijective LCG key) + the
    two streaming scan passes of ordered_prefix_sum — O(blocks) driver
    state, no second shuffle, no driver-side permutation table.
    """

    def add_key(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": pa.array(ids.astype(np.int64), pa.int64()),
                "skey": pa.array(shuffle_key_u64(ids), pa.uint64()),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    keyed = ds.select_columns([id_col]).map_batches(
        add_key, batch_format="pyarrow"
    )
    scanned = ordered_prefix_sum(keyed, "skey", "one", out_col="rn")

    def finish(b: pa.Table) -> pa.Table:
        rn = b.column("rn").to_numpy()
        return pa.table(
            {
                "id": b.column("id"),
                "shard": pa.array(rn // shard_rows, pa.int64()),
                "pos": pa.array(rn % shard_rows, pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# GPT-style sequence packing: concatenate → chop at exact token boundaries
# ---------------------------------------------------------------------------


def pack_and_chop(
    docs: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_kind: str = "bpe_tokens",
) -> "ray.data.Dataset":
    """Pack-and-chop sequence assignment (the GPT pretraining layout):
    concatenate every document's token stream in id order and cut the
    stream into training sequences of EXACTLY ``budget`` tokens (documents
    split across boundaries; the final sequence may be partial).

    Emits one row per (document, sequence) overlap:
      (id_col, seq_id, seq_off, doc_off, n) — the document contributes its
    tokens [doc_off, doc_off+n) at positions [seq_off, seq_off+n) of
    sequence seq_id. Zero-token documents emit nothing.

    Unlike pack_token_shards (whole-document shard routing, no splits),
    this is the exact chopped layout a sequence-packing dataloader
    materializes. Cost: the one sort + two streaming passes of
    ordered_prefix_sum, then a stateless explode (each doc spans
    ceil-ish (n_tokens/budget)+1 sequences at most) — no extra shuffle.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from raydedup.textstats import token_counts

    toks = docs.map_batches(
        lambda b: token_counts(b, text_col=text_col).select([id_col, token_kind]),
        batch_format="pyarrow",
    )
    scanned = ordered_prefix_sum(toks, id_col, token_kind)

    def _explode(b: pa.Table) -> pa.Table:
        start = b.column("cum_exclusive").to_numpy(zero_copy_only=False)
        n = b.column(token_kind).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        keep = n > 0
        start, n, ids = start[keep], n[keep], ids[keep]
        end = start + n
        first = start // budget
        last = (end - 1) // budget
        reps = (last - first + 1).astype(np.int64)
        if not len(reps) or int(reps.sum()) == 0:
            return pa.table(
                {
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_off": pa.array([], pa.int64()),
                    "doc_off": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ridx = np.repeat(np.arange(len(reps)), reps)
        # within-doc sequence index 0..reps-1 via the offset-subtraction trick
        offs = np.arange(len(ridx)) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
        )
        seq = first[ridx] + offs
        span_lo = np.maximum(start[ridx], seq * budget)
        span_hi = np.minimum(end[ridx], (seq + 1) * budget)
        return pa.table(
            {
                id_col: pa.array(ids[ridx], b.schema.field(id_col).type),
                "seq_id": pa.array(seq, pa.int64()),
                "seq_off": pa.array(span_lo - seq * budget, pa.int64()),
                "doc_off": pa.array(span_lo - start[ridx], pa.int64()),
                "n": pa.array(span_hi - span_lo, pa.int64()),
            }
        )

    return scanned.map_batches(_explode, batch_format="pyarrow")
