"""Ray Data AggregateFn wrappers around the mergeable sketches.

The reference's Union partial/final split (theta/UnionImpl.java:300-357)
maps 1:1 onto Ray's AggregateFn(init, accumulate_block, merge, finalize):
per-block partial sketches accumulate locally, merge in the combiner tree,
finalize extracts the estimate — this is how sketches were always meant to
be distributed (theta/package-info.java:20-26: callers own distribution).

All accumulators serialize to bytes between stages (cloudpickle-safe and
compact). Input hashing uses the theta ingest convention
(murmur3_128(seed)[0] >>> 1, theta/UpdateSketch.java:222) for int64/string
datums so estimates are reproducible across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFn

from .hashing import murmur3_128_flat, splitmix64, theta_hash_u64s
from .kmv import KmvSketch, build_sketch, empty_sketch, union_many
from .sketches.freq import FrequentKeysSketch
from .sketches.hll import HllSketch
from .sketches.doubles import DoublesSketch
from .sketches.kll import KllSketch


def _column_theta_hashes(block: pa.Table, col: str, seed: int) -> np.ndarray:
    arr = block.column(col)
    if pa.types.is_integer(arr.type):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        return theta_hash_u64s(vals, seed)
    # strings: murmur3 over utf8 bytes per datum (update(String) semantics),
    # vectorized over the column's zero-copy (flat, offsets) buffers
    from .tokenize import _string_array_np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat, off = _string_array_np(arr)
    h1, _ = murmur3_128_flat(flat, off, seed)
    return h1 >> np.uint64(1)


def _column_hash_pairs(
    block: pa.Table, col: str, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Both murmur3-128 output words per datum — the reference's full hash
    for families that consume two words (CPC: CpcSketch.java:310-313 passes
    hash[0] AND hash[1] to hashUpdate). Same datum byte conventions as
    _column_theta_hashes (int64 LE image / utf8 bytes)."""
    from .hashing import murmur3_128_u64s

    arr = block.column(col)
    if pa.types.is_integer(arr.type):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        return murmur3_128_u64s(vals[:, None], seed)
    from .tokenize import _string_array_np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat, off = _string_array_np(arr)
    return murmur3_128_flat(flat, off, seed)


def theta_distinct(col: str, k: int = 4096, seed: int = 9001, name: str | None = None) -> AggregateFn:
    """Theta-sketch distinct count of a column; exact while n_distinct <= k."""

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = KmvSketch.deserialize(state) if state else empty_sketch(k)
        h = _column_theta_hashes(block, col, seed)
        new = build_sketch(np.concatenate([sk.hashes, h]), k)
        # keep the min-theta rule across partials
        if sk.theta < new.theta:
            hs = new.hashes[new.hashes < sk.theta]
            new = KmvSketch(sk.theta, hs, k)
        return new.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or empty_sketch(k).serialize()
        if not b:
            return a
        return union_many(
            [KmvSketch.deserialize(a), KmvSketch.deserialize(b)], k
        ).serialize()

    def fin(state: bytes | None) -> float:
        sk = KmvSketch.deserialize(state) if state else empty_sketch(k)
        return sk.estimate()

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=fin,
        name=name or f"theta_distinct({col})",
    )


def hll_distinct(col: str, lg_k: int = 12, seed: int = 9001, name: str | None = None) -> AggregateFn:
    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = HllSketch.deserialize(state) if state else HllSketch(lg_k)
        h = _column_theta_hashes(block, col, seed)
        # remix 63-bit theta hashes to fill all 64 bits uniformly: HllSketch
        # reads disjoint low(index)/high(rho) bit fields
        sk.update_hashes(splitmix64(h))
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or HllSketch(lg_k).serialize()
        if not b:
            return a
        return HllSketch.deserialize(a).merge(HllSketch.deserialize(b)).serialize()

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: HllSketch.deserialize(s).estimate() if s else 0.0,
        name=name or f"hll_distinct({col})",
    )


def cpc_distinct(col: str, lg_k: int = 11, seed: int = 9001, name: str | None = None) -> AggregateFn:
    """CPC-sketch distinct count of a column (cpc/CpcSketch.java role:
    smallest-space mergeable counter). Partials OR-merge in the combiner
    tree; finalize returns the ICON estimate."""
    from .sketches.cpc import CpcSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = CpcSketch.deserialize(state) if state else CpcSketch(lg_k)
        h0, h1 = _column_hash_pairs(block, col, seed)
        sk.update_hash_pairs(h0, h1)
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or CpcSketch(lg_k).serialize()
        if not b:
            return a
        return CpcSketch.deserialize(a).merge(CpcSketch.deserialize(b)).serialize()

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: CpcSketch.deserialize(s).estimate() if s else 0.0,
        name=name or f"cpc_distinct({col})",
    )


def doubles_quantile(
    col: str, ranks: list[float], k: int = 128, name: str | None = None
) -> AggregateFn:
    """Classic-quantiles (DoublesSketch) of a numeric column at the given
    ranks; INCLUSIVE criterion (matches DuckDB quantile_disc in the exact
    regime, i.e. while total n <= 2k and no compaction has happened)."""

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = DoublesSketch.deserialize(state) if state else DoublesSketch(k)
        sk.update_many(block.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or DoublesSketch(k).serialize()
        if not b:
            return a
        return (
            DoublesSketch.deserialize(a)
            .merge(DoublesSketch.deserialize(b))
            .serialize()
        )

    def fin(state: bytes | None):
        sk = DoublesSketch.deserialize(state) if state else DoublesSketch(k)
        return sk.quantiles(ranks)

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=fin,
        name=name or f"doubles_quantile({col})",
    )


def kll_quantile(
    col: str, ranks: list[float], k: int = 200, name: str | None = None
) -> AggregateFn:
    """KLL quantiles of a numeric column at the given ranks (list result)."""

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = KllSketch.deserialize(state) if state else KllSketch(k)
        sk.update_many(block.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or KllSketch(k).serialize()
        if not b:
            return a
        return KllSketch.deserialize(a).merge(KllSketch.deserialize(b)).serialize()

    def fin(state: bytes | None):
        sk = KllSketch.deserialize(state) if state else KllSketch(k)
        return sk.quantiles(ranks)

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=fin,
        name=name or f"kll_quantile({col})",
    )


def req_quantile(
    col: str,
    ranks: list[float],
    k: int = 12,
    hra: bool = True,
    name: str | None = None,
) -> AggregateFn:
    """REQ relative-error quantiles of a numeric column (req/ReqSketch.java
    role: near-exact extreme quantiles, HRA by default)."""
    import pickle

    from .sketches.req import ReqSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = pickle.loads(state) if state else ReqSketch(k, hra)
        sk.update_many(
            block.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pickle.dumps(sk)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(ReqSketch(k, hra))
        if not b:
            return a
        return pickle.dumps(pickle.loads(a).merge(pickle.loads(b)))

    def fin(state: bytes | None):
        sk = pickle.loads(state) if state else ReqSketch(k, hra)
        return [sk.quantile(r) for r in ranks]

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=fin,
        name=name or f"req_quantile({col})",
    )


def kll_quantile_items(
    col: str, ranks: list[float], k: int = 200, name: str | None = None
) -> AggregateFn:
    """KLL quantiles of a GENERIC comparable column (strings, ...) at the
    given ranks (quantiles/ItemsSketch.java:150 role)."""
    from .sketches.kll_items import KllItemsSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = KllItemsSketch.deserialize(state) if state else KllItemsSketch(k)
        sk.update_many(block.column(col).to_pylist())
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or KllItemsSketch(k).serialize()
        if not b:
            return a
        return (
            KllItemsSketch.deserialize(a)
            .merge(KllItemsSketch.deserialize(b))
            .serialize()
        )

    def fin(state: bytes | None):
        sk = KllItemsSketch.deserialize(state) if state else KllItemsSketch(k)
        return sk.quantiles(ranks)

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=fin,
        name=name or f"kll_quantile_items({col})",
    )


def reservoir_sample(col: str, k: int = 64, seed: int = 0, name: str | None = None) -> AggregateFn:
    """Uniform k-sample of a column (ReservoirItemsSketch partial+final)."""
    import pickle

    from .sketches.sampling import ReservoirSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = pickle.loads(state) if state else ReservoirSketch(k, seed)
        sk.update_many(block.column(col).to_pylist())
        return pickle.dumps(sk)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(ReservoirSketch(k, seed))
        if not b:
            return a
        return pickle.dumps(pickle.loads(a).merge(pickle.loads(b)))

    def fin(state: bytes | None):
        # Keep the true stream count (ReservoirItemsSketch.getN() contract,
        # sampling/ReservoirItemsSketch.java:~200) alongside the sample —
        # discarding it here would silently cap n at k once a group exceeds
        # the reservoir size.
        sk = pickle.loads(state) if state else ReservoirSketch(k, seed)
        return {"n": sk.n, "samples": sk.samples}

    return AggregateFn(
        init=lambda key: None, merge=merge, accumulate_block=acc,
        finalize=fin, name=name or f"reservoir({col})",
    )


def weighted_sample(
    key_col: str, weight_col: str, k: int = 64, seed: int = 0, name: str | None = None
) -> AggregateFn:
    """Weighted (priority) sample with subset-sum estimation — the VarOpt
    surface (sampling/VarOptItemsSketch.java:59-71) as a Ray aggregate.
    Finalizes to the serialized PrioritySample (pickle) for driver-side
    estimate_subset_sum calls."""
    import pickle

    from .sketches.sampling import PrioritySample

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = pickle.loads(state) if state else PrioritySample(k, seed)
        sk.update_many(
            block.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64),
            block.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64),
        )
        return pickle.dumps(sk)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(PrioritySample(k, seed))
        if not b:
            return a
        return pickle.dumps(pickle.loads(a).merge(pickle.loads(b)))

    return AggregateFn(
        init=lambda key: None, merge=merge, accumulate_block=acc,
        finalize=lambda s: s or pickle.dumps(PrioritySample(k, seed)),
        name=name or f"weighted_sample({key_col})",
    )


def varopt_sample(
    key_col: str, weight_col: str, k: int = 64, seed: int = 0, name: str | None = None
) -> AggregateFn:
    """Variance-optimal weighted sample (sampling/VarOptItemsSketch.java:
    59-71) as a Ray aggregate: per-block sketches merge in the combiner
    tree; finalizes to the serialized sketch (pickle) for driver-side
    estimate_subset_sum calls."""
    import pickle

    from .sketches.sampling import VarOptItemsSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = pickle.loads(state) if state else VarOptItemsSketch(k, seed)
        sk.update_many(
            block.column(key_col).to_pylist(),
            block.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64),
        )
        return pickle.dumps(sk)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(VarOptItemsSketch(k, seed))
        if not b:
            return a
        return pickle.dumps(pickle.loads(a).merge(pickle.loads(b)))

    return AggregateFn(
        init=lambda key: None, merge=merge, accumulate_block=acc,
        finalize=lambda s: s or pickle.dumps(VarOptItemsSketch(k, seed)),
        name=name or f"varopt_sample({key_col})",
    )


def tuple_distinct_sum(
    key_col: str,
    value_col: str,
    k: int = 4096,
    seed: int = 9001,
    name: str | None = None,
) -> AggregateFn:
    """Tuple-sketch aggregate: distinct count of key_col + per-key summed
    value_col payload (tuple/UpdatableSketch semantics, Sum summary mode).
    Finalizes to [distinct_estimate, retained_value_sum] — in exact mode the
    second equals SUM(value_col) over the whole group."""
    import pickle

    from .sketches.tuple import TupleSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = pickle.loads(state) if state else TupleSketch.empty(k, 1, "sum")
        h = _column_theta_hashes(block, key_col, seed)
        v = block.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        sk = sk.update_many(h, v[:, None])
        return pickle.dumps(sk)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(TupleSketch.empty(k, 1, "sum"))
        if not b:
            return a
        return pickle.dumps(pickle.loads(a).union(pickle.loads(b)))

    def fin(state: bytes | None):
        sk = pickle.loads(state) if state else TupleSketch.empty(k, 1, "sum")
        return [sk.estimate(), float(sk.values.sum())]

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=fin,
        name=name or f"tuple_distinct_sum({key_col},{value_col})",
    )


def frequent_items_generic(
    col: str, max_map_size: int = 4096, name: str | None = None
) -> AggregateFn:
    """Misra-Gries heavy hitters of a GENERIC (string, ...) column —
    frequencies/ItemsSketch.java:150 role. Per-block counts come from one
    vectorized pyarrow value_counts pass; the python loop is bounded by the
    distinct count per block."""
    import pyarrow.compute as pc

    from .sketches.freq import FrequentItemsSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = (
            FrequentItemsSketch.deserialize(state)
            if state
            else FrequentItemsSketch(max_map_size)
        )
        vc = pc.value_counts(block.column(col))
        sk.update_many(
            vc.field("values").to_pylist(),
            vc.field("counts").to_numpy(zero_copy_only=False),
        )
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or FrequentItemsSketch(max_map_size).serialize()
        if not b:
            return a
        return (
            FrequentItemsSketch.deserialize(a)
            .merge(FrequentItemsSketch.deserialize(b))
            .serialize()
        )

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s or FrequentItemsSketch(max_map_size).serialize(),
        name=name or f"frequent_items_generic({col})",
    )


def frequent_items(
    col: str, max_map_size: int = 4096, name: str | None = None
) -> AggregateFn:
    """Misra-Gries heavy hitters of an integer column → serialized sketch."""

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = (
            FrequentKeysSketch.deserialize(state)
            if state
            else FrequentKeysSketch(max_map_size)
        )
        sk.update_many(block.column(col).to_numpy(zero_copy_only=False).astype(np.int64))
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or FrequentKeysSketch(max_map_size).serialize()
        if not b:
            return a
        return (
            FrequentKeysSketch.deserialize(a)
            .merge(FrequentKeysSketch.deserialize(b))
            .serialize()
        )

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s or FrequentKeysSketch(max_map_size).serialize(),
        name=name or f"frequent_items({col})",
    )


def alpha_distinct(col: str, lg_k: int = 14, seed: int = 9001, name: str | None = None) -> AggregateFn:
    """Alpha-sketch distinct count of a column. Each block runs the
    single-stream alpha update path (theta/HeapAlphaSketch.java:323-369);
    partials hand off as compact theta form and merge via the standard
    theta union — exactly the reference's guidance for distributing alpha
    (alpha is single-stream; unions go through theta Union on compact()).
    Exact while every block's distinct count stays <= k and the union
    keeps all hashes (the oracle regime)."""
    from .sketches.alpha import AlphaSketch

    k = 1 << lg_k

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = AlphaSketch(lg_k=lg_k, seed=seed)
        sk.update_hashes(_column_theta_hashes(block, col, seed))
        partial = sk.compact()
        if not state:
            return partial.serialize()
        return union_many([KmvSketch.deserialize(state), partial], k).serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or empty_sketch(k).serialize()
        if not b:
            return a
        return union_many(
            [KmvSketch.deserialize(a), KmvSketch.deserialize(b)], k
        ).serialize()

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: KmvSketch.deserialize(s).estimate() if s else 0.0,
        name=name or f"alpha_distinct({col})",
    )


def kll_sketch(col: str, k: int = 200, name: str | None = None) -> AggregateFn:
    """KLL aggregate finalizing to the SERIALIZED SKETCH rather than a
    quantile list — the per-group artifact downstream distribution
    comparisons consume (KllSketch.ks_delta/ks_test, further merges;
    quantiles/KolmogorovSmirnov.java:26-54 takes two sketches, not two
    quantile vectors). State stays compact bytes through the combiner
    tree; the driver receives one small sketch per group."""

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = KllSketch.deserialize(state) if state else KllSketch(k)
        sk.update_many(
            block.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return sk.serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or KllSketch(k).serialize()
        if not b:
            return a
        return KllSketch.deserialize(a).merge(KllSketch.deserialize(b)).serialize()

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s if s else KllSketch(k).serialize(),
        name=name or f"kll_sketch({col})",
    )


def hllmap_unique(
    key_col: str,
    id_col: str,
    lg_k: int = 10,
    promote_at: int = 16,
    seed: int = 9001,
    name: str | None = None,
) -> AggregateFn:
    """UniqueCountMap aggregate (hllmap/UniqueCountMap.java:24-172 role):
    distinct ``id_col`` count per ``key_col`` for millions of skewed keys in
    bounded memory — the long tail stays in exact coupon sets (~10 B/key),
    only hot keys get a real HLL. One map per block, merged through Ray's
    combiner tree; finalize returns the pickled map (call .items() for the
    (keys, estimates) table). Exact while every key stays in the coupon
    tier (<= promote_at distinct ids) — the oracle regime."""
    import pickle

    from .sketches.hllmap import UniqueCountMap

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        m = pickle.loads(state) if state else UniqueCountMap(lg_k, promote_at)
        keys = block.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # remix 63-bit theta hashes to fill all 64 bits uniformly: the
        # map's HLL tier reads disjoint low(index)/high(rho) bit fields,
        # and a permanently-zero top bit biases rho +1 → ~2× overestimate
        # (same remix as hll_distinct; caught by scripts/estimation_sweep.py)
        ids = splitmix64(_column_theta_hashes(block, id_col, seed))
        m.update_block(keys, ids)
        return pickle.dumps(m)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(UniqueCountMap(lg_k, promote_at))
        if not b:
            return a
        return pickle.dumps(pickle.loads(a).merge(pickle.loads(b)))

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s if s else pickle.dumps(UniqueCountMap(lg_k, promote_at)),
        name=name or f"hllmap_unique({key_col},{id_col})",
    )


def tuple_sketch(
    key_col: str,
    value_col: str | None = None,
    k: int = 4096,
    seed: int = 9001,
    mode: str = "sum",
    name: str | None = None,
) -> AggregateFn:
    """Tuple-sketch aggregate finalizing to the PICKLED SKETCH — the
    per-group artifact tuple set-algebra and tuple_jaccard
    (tuple/JaccardSimilarity.java) consume downstream. ``value_col=None``
    updates with a constant 1.0 payload (AlwaysOne-style presence
    summary)."""
    import pickle

    from .sketches.tuple import TupleSketch

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = pickle.loads(state) if state else TupleSketch.empty(k, 1, mode)
        h = _column_theta_hashes(block, key_col, seed)
        if value_col is None:
            v = np.ones(len(h), dtype=np.float64)
        else:
            v = (
                block.column(value_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        sk = sk.update_many(h, v[:, None])
        return pickle.dumps(sk)

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or pickle.dumps(TupleSketch.empty(k, 1, mode))
        if not b:
            return a
        return pickle.dumps(pickle.loads(a).union(pickle.loads(b)))

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s if s else pickle.dumps(TupleSketch.empty(k, 1, mode)),
        name=name or f"tuple_sketch({key_col})",
    )


def theta_sketch_agg(
    col: str, k: int = 4096, seed: int = 9001, name: str | None = None
) -> AggregateFn:
    """Theta aggregate finalizing to the SERIALIZED SKETCH rather than the
    estimate — the sketch-warehouse pattern (theta/package-info.java:20-26:
    store per-partition sketches, merge at query time). The finalized bytes
    are a Parquet binary cell; re-aggregate stored cells with
    theta_union_sketches."""

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        sk = KmvSketch.deserialize(state) if state else empty_sketch(k)
        h = _column_theta_hashes(block, col, seed)
        return union_many([sk, build_sketch(h, k)], k).serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or empty_sketch(k).serialize()
        if not b:
            return a
        return union_many(
            [KmvSketch.deserialize(a), KmvSketch.deserialize(b)], k
        ).serialize()

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: s if s else empty_sketch(k).serialize(),
        name=name or f"theta_sketch_agg({col})",
    )


def theta_union_sketches(col: str, k: int = 4096, name: str | None = None) -> AggregateFn:
    """Union a column of STORED serialized theta sketches (theta/Union.java
    over persisted images — the query-time half of the sketch warehouse).
    Finalizes to the merged sketch's distinct estimate."""

    def acc(state: bytes | None, block: pa.Table) -> bytes:
        cells = block.column(col).to_pylist()
        sks = [KmvSketch.deserialize(c) for c in cells if c]
        if state:
            sks.append(KmvSketch.deserialize(state))
        if not sks:
            return empty_sketch(k).serialize()
        return union_many(sks, k).serialize()

    def merge(a: bytes | None, b: bytes | None) -> bytes:
        if not a:
            return b or empty_sketch(k).serialize()
        if not b:
            return a
        return union_many(
            [KmvSketch.deserialize(a), KmvSketch.deserialize(b)], k
        ).serialize()

    return AggregateFn(
        init=lambda key: None,
        merge=merge,
        accumulate_block=acc,
        finalize=lambda s: KmvSketch.deserialize(s).estimate() if s else 0.0,
        name=name or f"theta_union_sketches({col})",
    )
