"""Corpus-curation operators: per-key document caps and the composed
curation pipeline (quality filter → exact-dedup survivors → per-key cap →
token-budget shard packing).

``cap_per_key`` keeps at most ``k`` rows per key (the "at most N documents
per domain/repo" rule of web-corpus curation), preferring the smallest
``order_col`` — deterministic when (key, order_col) is unique, which a
unique doc id guarantees.

Scale shape: one hash-partition shuffle that co-locates equal keys into
~2×CPU partition groups (pipeline.grouped_blocks — one Python call per
PARTITION, never per key), then a single lexsort + run-boundary rank filter
per partition. Equivalent SQL: ``row_number() OVER (PARTITION BY key ORDER
BY order_col) <= k`` — the oracle in __ray_entry__ mirrors it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def cap_per_key(
    ds: "ray.data.Dataset",  # noqa: F821 - forward ref; ray imported lazily
    key: str,
    order_col: str,
    k: int,
) -> "ray.data.Dataset":  # noqa: F821
    """Keep the ``k`` smallest-``order_col`` rows of every ``key`` group."""
    if k <= 0:
        raise ValueError("k must be positive")
    from .pipeline import grouped_blocks, key_codes

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        kc = key_codes(b.column(key))
        oc = key_codes(b.column(order_col))
        order = np.lexsort((oc, kc))
        kk = kc[order]
        idx = np.arange(len(kk))
        new_run = np.concatenate([[True], kk[1:] != kk[:-1]])
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        keep = order[(idx - run_start) < k]
        keep.sort()  # preserve the block's row order among survivors
        return b.take(pa.array(keep, pa.int64()))

    return grouped_blocks(ds, key, block)


def dedup_survivors_by_text(
    ds: "ray.data.Dataset",  # noqa: F821
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":  # noqa: F821
    """Exact-duplicate survivors: the smallest-``id_col`` row of every
    identical-``text_col`` group, all columns preserved. Same
    hash-partitioned one-shuffle shape as the flagship's exact tier
    (pipeline.grouped_blocks keyed on the text bytes)."""
    from .pipeline import grouped_blocks, key_codes

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        ids = key_codes(b.column(id_col))
        tc = key_codes(b.column(text_col))
        order = np.lexsort((ids, tc))
        t_s = tc[order]
        first = np.concatenate([[True], t_s[1:] != t_s[:-1]])
        keep = np.sort(order[first])
        return b.take(pa.array(keep, pa.int64()))

    return grouped_blocks(ds, text_col, block)


def split_assign(
    ds: "ray.data.Dataset",  # noqa: F821
    id_col: str,
    fractions: dict[str, float],
    method: str = "hash",
    seed: int = 9001,
    buckets: int = 1_000_000,
) -> "ray.data.Dataset":  # noqa: F821
    """Deterministic train/val/test split assignment: appends a ``split``
    column chosen by bucketing each row's id.

    * ``method="hash"`` — bucket = splitmix64(id ^ seed) % buckets: the
      production mode (uniform regardless of id distribution, stable across
      runs/machines, new rows never reshuffle old ones). Not
      SQL-expressible; scalar-reference pytest covers it.
    * ``method="modulo"`` — bucket = id % buckets: bit-wise SQL-mirrorable
      (the driver oracle mode); uniform only if ids are dense.

    Fractions are cut as cumulative boundaries in dict order (must sum to
    ≤ 1; any remainder gets the LAST label). Embarrassingly parallel — one
    stateless map_batches, no shuffle.
    """
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1")
    if method not in ("hash", "modulo"):
        raise ValueError(f"unknown method {method!r}")
    labels = list(fractions)
    cuts = np.cumsum([fractions[l] for l in labels]) * buckets
    # ceil with a 1e-9 back-off: a cumulative fraction whose product is an
    # INTENDED integer can land epsilon above it in floats (0.9+0.05 →
    # 950000.0000000001 at 1e6 buckets), and plain ceil would shift the
    # boundary bucket to the wrong label — breaking the documented SQL
    # mirror `bucket < frac*buckets`. Genuine non-integers still ceil up.
    cuts = np.ceil(cuts[:-1] - 1e-9).astype(np.int64)  # last label takes the rest

    def block(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if method == "hash":
            from .hashing import splitmix64

            u = splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
            bucket = (u % np.uint64(buckets)).astype(np.int64)
        else:
            bucket = np.mod(ids, buckets)
        pick = np.searchsorted(cuts, bucket, side="right")
        return b.append_column(
            "split", pa.array(np.asarray(labels, dtype=object)[pick])
        )

    return ds.map_batches(block, batch_format="pyarrow")


def select_survivors(
    assign: "ray.data.Dataset",  # noqa: F821
    scores: "ray.data.Dataset",  # noqa: F821
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
) -> "ray.data.Dataset":  # noqa: F821
    """Per-dup-cluster survivor selection by QUALITY: for every cluster in
    ``assign`` (id → cluster_col), keep the member with the highest
    ``score_col`` from ``scores`` (id → score), ties broken by smallest id —
    the "keep the best copy, not the first copy" policy of real curation
    pipelines. Output: ``(cluster_col, survivor_id, score_col)``.

    Join-free scale shape: the two inputs are tagged and unioned, one
    hash-partition shuffle on id merges each id's (cluster, score) pair
    vectorized (no Dataset.join — 24 B/row either way, but this path has no
    aggregator-actor partition budget to manage), then a second
    hash-partition on cluster runs the argmax as a run-boundary cut. Ids
    present on only one side drop out (inner semantics).
    """
    import pyarrow.compute as pc

    from .pipeline import grouped_blocks

    def tag_assign(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b.column(id_col),
                cluster_col: b.column(cluster_col),
                score_col: pa.nulls(b.num_rows, pa.float64()),
            }
        )

    def tag_scores(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b.column(id_col),
                cluster_col: pa.nulls(b.num_rows, pa.int64()),
                score_col: pc.cast(b.column(score_col), pa.float64()),
            }
        )

    merged = assign.map_batches(tag_assign, batch_format="pyarrow").union(
        scores.map_batches(tag_scores, batch_format="pyarrow")
    )

    def merge_by_id(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                cluster_col: pa.array([], pa.int64()),
                score_col: pa.array([], pa.float64()),
            }
        )
        if b.num_rows == 0:
            return empty
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # null → NaN via Arrow cast (nullable int64 must not round-trip
        # through object dtype)
        clf = pc.cast(b.column(cluster_col), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        scf = pc.cast(b.column(score_col), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        has_cl = ~np.isnan(clf)
        has_sc = ~np.isnan(scf)
        order = np.argsort(ids, kind="stable")
        ids, clf, scf = ids[order], clf[order], scf[order]
        has_cl, has_sc = has_cl[order], has_sc[order]
        starts = np.ones(len(ids), dtype=bool)
        starts[1:] = ids[1:] != ids[:-1]
        run = np.cumsum(starts) - 1
        nrun = run[-1] + 1
        out_cl = np.full(nrun, np.nan)
        out_sc = np.full(nrun, np.nan)
        out_cl[run[has_cl]] = clf[has_cl]
        out_sc[run[has_sc]] = scf[has_sc]
        both = ~np.isnan(out_cl) & ~np.isnan(out_sc)
        return pa.table(
            {
                id_col: pa.array(ids[starts][both], pa.int64()),
                cluster_col: pa.array(out_cl[both].astype(np.int64), pa.int64()),
                score_col: pa.array(out_sc[both], pa.float64()),
            }
        )

    joined = grouped_blocks(merged, id_col, merge_by_id)

    def argmax_block(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                cluster_col: pa.array([], pa.int64()),
                "survivor_id": pa.array([], pa.int64()),
                score_col: pa.array([], pa.float64()),
            }
        )
        if b.num_rows == 0:
            return empty
        ids = b.column(id_col).to_numpy()
        cl = b.column(cluster_col).to_numpy()
        sc = b.column(score_col).to_numpy()
        order = np.lexsort((ids, -sc, cl))
        cl_s = cl[order]
        first = np.ones(len(cl_s), dtype=bool)
        first[1:] = cl_s[1:] != cl_s[:-1]
        pick = order[first]
        return pa.table(
            {
                cluster_col: pa.array(cl[pick], pa.int64()),
                "survivor_id": pa.array(ids[pick], pa.int64()),
                score_col: pa.array(sc[pick], pa.float64()),
            }
        )

    return grouped_blocks(joined, cluster_col, argmax_block)


def sample_stratified(
    ds: "ray.data.Dataset",  # noqa: F821
    key: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    method: str = "hash",
    seed: int = 4242,
    buckets: int = 1_000_000,
) -> "ray.data.Dataset":  # noqa: F821
    """Deterministic per-stratum downsampling — the "rebalance the data
    mix" curation op (keep X% of each overrepresented source/domain/lang).

    A row survives iff ``bucket(id) < thr[key]`` where ``thr`` is the
    integer threshold :func:`stratified_thresholds` derives from the rate
    (same 1e-9 ceil back-off as :func:`split_assign`, so intended-integer
    boundaries never drift). ``method="hash"`` buckets by splitmix64
    (production: uniform for any id distribution, stable under growth);
    ``method="modulo"`` is the bit-wise SQL-mirrorable oracle mode.
    Embarrassingly parallel — one stateless map_batches, no shuffle; the
    rate table rides the closure (it is config, not data).
    """
    if method not in ("hash", "modulo"):
        raise ValueError(f"unknown method {method!r}")
    thr = stratified_thresholds(rates, default_rate, buckets)
    default_thr = thr.pop("__default__")

    def block(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if method == "hash":
            from .hashing import splitmix64

            u = splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
            bucket = (u % np.uint64(buckets)).astype(np.int64)
        else:
            bucket = np.mod(ids, buckets)
        keys = b.column(key).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        per_uniq = np.array(
            [thr.get(k, default_thr) for k in uniq.tolist()], dtype=np.int64
        )
        keep = bucket < per_uniq[inv]
        return b.filter(pa.array(keep))

    return ds.map_batches(block, batch_format="pyarrow")


def stratified_thresholds(
    rates: dict[str, float], default_rate: float, buckets: int
) -> dict[str, int]:
    """Integer keep-thresholds per stratum (plus ``__default__``): row kept
    iff bucket < threshold. Exposed so the SQL oracle can be generated from
    the SAME integers the engine compares against."""
    for k, r in list(rates.items()) + [("default", default_rate)]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0, 1]")
    out = {
        k: int(np.ceil(r * buckets - 1e-9)) for k, r in rates.items()
    }
    out["__default__"] = int(np.ceil(default_rate * buckets - 1e-9))
    return out


def curate_corpus(
    docs: "ray.data.Dataset",  # noqa: F821
    *,
    quality_threshold: float,
    cap_key: str,
    cap_k: int,
    shard_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":  # noqa: F821
    """The end-to-end training-corpus curation pipeline, each stage the
    library's own operator:

    1. quality filter (textstats.quality_score ≥ threshold, vectorized);
    2. exact-duplicate survivors (min-id per identical text, one
       hash-partition shuffle);
    3. at most ``cap_k`` docs per ``cap_key`` (one hash-partition shuffle);
    4. token-budget shard assignment (ordered prefix scan; one sort).

    Output: (id_col, n_tokens, shard_id). Every stage is SQL-mirrorable, so
    the whole composition carries a DuckDB value-hash oracle
    (__ray_entry__._q_curate_corpus).
    """
    import pyarrow.compute as pc

    from .scan import pack_token_shards
    from .textstats import quality_score

    def qfilter(b: pa.Table) -> pa.Table:
        q = quality_score(b, text_col=text_col).column("quality")
        keep = pc.and_(
            pc.greater_equal(q, pa.scalar(float(quality_threshold))),
            pc.is_valid(b.column(text_col)),  # null text never survives
        )
        return b.filter(keep)

    kept = docs.map_batches(qfilter, batch_format="pyarrow")
    surv = dedup_survivors_by_text(kept, id_col=id_col, text_col=text_col)
    capped = cap_per_key(surv, key=cap_key, order_col=id_col, k=cap_k)
    return pack_token_shards(
        capped, budget=shard_budget, id_col=id_col, text_col=text_col
    )


def curate_corpus_v2(
    corpus: "ray.data.Dataset",  # noqa: F821
    *,
    span_window: int = 20,
    lm_min_count: int = 3,
    cap_key: str = "repo",
    cap_k: int = 18,
    shard_budget: int = 8192,
    cfg=None,
) -> "ray.data.Dataset":  # noqa: F821
    """The web-curation composition over the CORPUS schema (id, repo,
    content) — five library operators chained, every stage SQL-mirrorable
    so the whole composition carries one DuckDB value-hash oracle:

    1. exact substring span dedup rewrite (spans.strip_duplicate_spans,
       ``repo`` passed through map-side);
    2. bigram-LM hit-rate filter over the STRIPPED text: keep docs whose
       bigram occurrences are at least half in-model — the integer
       cross-multiplication ``2·n_hits >= n_bigrams`` (docs with no
       bigrams trivially pass: 0 >= 0). Model self-trained on the
       stripped corpus (lm.bigram_model);
    3. exact-duplicate survivors on the stripped text (min id per group);
    4. at most ``cap_k`` docs per ``cap_key``;
    5. token-budget shard assignment (ordered prefix scan).

    Output: (id, n_tokens, shard_id). The stripped corpus is materialized
    ONCE as a stage checkpoint (object store, spillable) because two
    passes consume it — the LM model build and the score+filter pass; a
    100 TB run would write this boundary to partitioned parquet instead
    (the manifest.py pattern), which is the same plan with durable blocks.
    """
    import pyarrow.compute as pc

    from .config import DEFAULT_CONFIG
    from .lm import lm_scores
    from .scan import pack_token_shards
    from .spans import strip_duplicate_spans

    cfg = cfg or DEFAULT_CONFIG
    stripped = strip_duplicate_spans(
        corpus, window=span_window, cfg=cfg, keep_cols=(cap_key,)
    ).materialize()
    scored = lm_scores(
        stripped,
        cfg,
        min_count=lm_min_count,
        keep_cols=("content", cap_key),
    )

    def lm_filter(b: pa.Table) -> pa.Table:
        nh = b.column("n_hits").to_numpy()
        nb = b.column("n_bigrams").to_numpy()
        return b.filter(pa.array(2 * nh >= nb)).select(
            ["id", "content", cap_key]
        )

    kept = scored.map_batches(lm_filter, batch_format="pyarrow")
    surv = dedup_survivors_by_text(kept, id_col="id", text_col="content")
    capped = cap_per_key(surv, key=cap_key, order_col="id", k=cap_k)
    return pack_token_shards(
        capped, budget=shard_budget, id_col="id", text_col="content"
    )


def temperature_thresholds(
    counts: dict[str, int],
    total_frac: tuple[int, int] = (1, 2),
    buckets: int = 1_000_000,
) -> dict[str, int]:
    """Integer bucket thresholds for temperature-0.5 data-mix rebalancing:
    target stratum shares p_s ∝ √n_s (the alpha=0.5 flattening rule of
    multilingual/multi-source training mixes, e.g. XLM-R/mT5), realized as
    per-stratum keep thresholds against the actual counts.

    Every step is INTEGER-exact and SQL-expressible so the oracle derives
    the same thresholds from the same count table: weight w_s =
    floor(ieee_sqrt(n_s)) (numpy sqrt is the correctly-rounded IEEE op —
    DuckDB's floor(sqrt(n)) computes the identical value), then
    thr_s = min(buckets, (tn·N·w_s·buckets) // (td·z·n_s)) with
    total_frac = tn/td, N = Σn, z = Σw. A row of stratum s survives iff
    bucket(id) < thr_s; expected kept fraction ≈ tn/td of the corpus with
    stratum shares ∝ √n_s (clamped at keep-everything for tiny strata)."""
    tn, td = total_frac
    if not counts or min(counts.values()) < 0:
        raise ValueError("counts must be non-empty and non-negative")
    if tn <= 0 or td <= 0 or tn > td:
        raise ValueError("total_frac must be a rational in (0, 1]")
    w = {s: int(np.floor(np.sqrt(float(n)))) for s, n in counts.items() if n > 0}
    z = sum(w.values())
    n_total = sum(counts.values())
    return {
        s: min(buckets, (tn * n_total * w[s] * buckets) // (td * z * counts[s]))
        for s in w
    }


def stratum_counts(
    ds: "ray.data.Dataset", key: str  # noqa: F821
) -> dict[str, int]:
    """Per-stratum row counts — one small groupby-count, collected to the
    driver (strata are few by definition)."""
    out: dict[str, int] = {}
    for b in ds.groupby(key).count().iter_batches(batch_format="pyarrow"):
        for k, c in zip(
            b.column(key).to_pylist(), b.column("count()").to_pylist()
        ):
            out[str(k)] = int(c)
    return out


def temperature_mix(
    ds: "ray.data.Dataset",  # noqa: F821
    key: str,
    id_col: str,
    total_frac: tuple[int, int] = (1, 2),
    method: str = "hash",
    seed: int = 4242,
    buckets: int = 1_000_000,
    counts: dict[str, int] | None = None,
) -> "ray.data.Dataset":  # noqa: F821
    """Rebalance a corpus toward temperature-0.5 stratum shares by
    deterministic downsampling: one tiny count groupby, integer
    :func:`temperature_thresholds`, then the same stateless bucket filter
    as :func:`sample_stratified` (no shuffle of the data)."""
    if method not in ("hash", "modulo"):
        raise ValueError(f"unknown method {method!r}")
    if counts is None:
        counts = stratum_counts(ds, key)
    thr = temperature_thresholds(counts, total_frac, buckets)

    def block(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if method == "hash":
            from .hashing import splitmix64

            u = splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
            bucket = (u % np.uint64(buckets)).astype(np.int64)
        else:
            bucket = np.mod(ids, buckets)
        keys = b.column(key).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        per_uniq = np.array(
            [thr.get(str(k), 0) for k in uniq.tolist()], dtype=np.int64
        )
        keep = bucket < per_uniq[inv]
        return b.filter(pa.array(keep))

    return ds.map_batches(block, batch_format="pyarrow")
