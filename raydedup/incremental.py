"""Incremental (cross-corpus) dedup: dedupe NEW files against an already-
deduped base corpus without re-verifying base-vs-base pairs.

The training-pipeline shape this serves: a 100 TB corpus is deduped once;
daily deltas arrive and must be (a) matched against the base, (b) deduped
among themselves, (c) assigned to existing clusters — re-running the full
O(corpus) pipeline per delta is wasteful. Here the base contributes only
its persisted SIGNATURE INDEX (the `signatures()` output — ~1 KB/doc, no
content) and its assignment table; the delta pays signature computation
plus ONE band shuffle over base-index + delta rows, with every base×base
candidate pair filtered out BEFORE sketch verification
(stages.make_block_pair_emitter cross_min_id).

Id contract: delta rows carry ids strictly greater than every base id
(append-only id space — the natural layout for arriving data). The
base×base filter, the exact-tier match direction and the "component root
is a base cluster when one is present" rule all follow from that ordering.

Semantics vs a full re-run: connectivity is preserved — a base endpoint is
replaced by its base cluster root before clustering, so paths through base
clusters survive the base×base filter; a delta doc bridging two base
clusters yields a row in the ``merges`` output (old_cluster →
new_cluster) rather than a rewrite of the base assignment table (apply
lazily downstream, the scalable choice).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .config import DEFAULT_CONFIG, SigConfig
from .pipeline import (
    detect_hot_band_keys,
    exact_edges,
    grouped_blocks,
    near_edges,
    signatures,
    substring_edges,
)
from .stages import SignatureStage
from .unionfind import cluster_edges


def write_signature_index(
    corpus: "ray.data.Dataset", path: str, cfg: SigConfig = DEFAULT_CONFIG
) -> None:
    """Persist the base corpus's signature index as partitioned parquet —
    the only base-side artifact an incremental run reads (content never
    re-reads). One file per input block → resumable, range-prunable."""
    signatures(corpus, cfg).write_parquet(path)


def read_signature_index(path: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(path)


def _cross_filter(boundary: int):
    def f(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        keep = (src >= boundary) | (dst >= boundary)
        return batch.filter(pa.array(keep))

    return f


def incremental_dup_pairs(
    all_sigs: "ray.data.Dataset",
    cfg: SigConfig,
    boundary: int,
    hot: dict[int, int] | None = None,
    with_substring: bool = True,
) -> "ray.data.Dataset":
    """Verified dup edges over base-index ∪ delta signatures where at least
    one endpoint is a delta doc (id >= boundary). Near-tier base×base
    candidates are dropped pre-verification; exact/substring tiers emit
    only cross or delta-delta rows."""
    e_exact = exact_edges(all_sigs).map_batches(
        _cross_filter(boundary), batch_format="pyarrow"
    )
    e_near = near_edges(
        all_sigs, cfg, hot, mode="bucket", cross_min_id=boundary
    ).select_columns(["src", "dst"])
    edges = e_exact.union(e_near)
    if with_substring:
        edges = edges.union(substring_edges(all_sigs, cfg, cross_min_id=boundary))
    return edges


def _collect_small(ds: "ray.data.Dataset", cols: list[str]) -> pa.Table:
    tables = [
        b
        for b in ds.select_columns(cols).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        )
        if b.num_rows
    ]
    if not tables:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    return pa.concat_tables(tables)


def _base_root_lookup(
    base_assign: "ray.data.Dataset", edges: "ray.data.Dataset", boundary: int
):
    """(sorted base ids, their base cluster roots) for base ids that appear
    in a cross edge — a SEMI-JOIN against the (huge) base assignment table:
    the involved-id set is edge-bounded (tiny), broadcast once via ray.put,
    and base_assign streams map-side against it."""

    def base_endpoints(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        both = np.concatenate([src, dst])
        return pa.table({"id": pa.array(np.unique(both[both < boundary]))})

    involved = _collect_small(
        edges.map_batches(base_endpoints, batch_format="pyarrow"), ["id"]
    )
    ids = np.unique(involved.column("id").to_numpy())
    if len(ids) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ids_ref = ray.put(ids)

    def semi(batch: pa.Table, ref=ids_ref) -> pa.Table:
        want = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        b_ids = batch.column("id").to_numpy()
        pos = np.searchsorted(want, b_ids)
        pos = np.clip(pos, 0, len(want) - 1)
        return batch.filter(pa.array(want[pos] == b_ids))

    hits = _collect_small(
        base_assign.map_batches(semi, batch_format="pyarrow"), ["id", "cluster_id"]
    )
    h_ids = hits.column("id").to_numpy()
    h_roots = hits.column("cluster_id").to_numpy()
    order = np.argsort(h_ids)
    return h_ids[order], h_roots[order]


def incremental_dedup(
    base_sigs: "ray.data.Dataset",
    base_assign: "ray.data.Dataset",
    delta_corpus: "ray.data.Dataset",
    cfg: SigConfig = DEFAULT_CONFIG,
    *,
    with_substring: bool = True,
    with_salting: bool = True,
    cluster_method: str = "auto",
) -> dict:
    """Dedupe a delta against a base signature index.

    Returns ``{"assignments": Dataset(id, cluster_id) for every delta doc,
    "merges": Dataset(old_cluster, new_cluster) for base clusters united
    by a delta bridge}``. cluster_id is an existing base cluster id when
    the component touches the base, else the min delta member id."""
    delta_sigs = delta_corpus.map_batches(
        SignatureStage(cfg), batch_format="pyarrow"
    ).materialize()
    base_max = base_sigs.max("id")
    delta_min = delta_sigs.min("id")
    if delta_min is not None and base_max is not None and delta_min <= base_max:
        raise ValueError(
            f"delta ids must exceed every base id (append-only contract): "
            f"base max {base_max} >= delta min {delta_min}"
        )
    boundary = int(base_max) + 1 if base_max is not None else 0

    all_sigs = base_sigs.union(delta_sigs).materialize()
    hot = detect_hot_band_keys(all_sigs, cfg) if with_salting else None
    edges = incremental_dup_pairs(
        all_sigs, cfg, boundary, hot, with_substring=with_substring
    ).materialize()

    # replace base endpoints by their BASE CLUSTER ROOT so connectivity
    # through base clusters survives the base×base filter; roots come from
    # an edge-bounded semi-join against the base assignment table
    b_ids, b_roots = _base_root_lookup(base_assign, edges, boundary)
    lookup_ref = ray.put((b_ids, b_roots))

    def map_to_roots(batch: pa.Table, ref=lookup_ref) -> pa.Table:
        ids_arr, roots_arr = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        out = {}
        for col in ("src", "dst"):
            v = batch.column(col).to_numpy().copy()
            if len(ids_arr):
                pos = np.clip(np.searchsorted(ids_arr, v), 0, len(ids_arr) - 1)
                hit = ids_arr[pos] == v
                v[hit] = roots_arr[pos[hit]]
            out[col] = pa.array(v)
        return pa.table(out)

    mapped = edges.map_batches(map_to_roots, batch_format="pyarrow")
    assigned = cluster_edges(mapped, method=cluster_method).materialize()

    def split_delta(batch: pa.Table) -> pa.Table:
        keep = batch.column("id").to_numpy() >= boundary
        return batch.filter(pa.array(keep))

    def split_merges(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        cl = batch.column("cluster_id").to_numpy()
        keep = (ids < boundary) & (cl != ids)
        return pa.table(
            {
                "old_cluster": pa.array(ids[keep]),
                "new_cluster": pa.array(cl[keep]),
            }
        )

    from .pipeline import assign_clusters

    assignments = assign_clusters(
        delta_sigs, assigned.map_batches(split_delta, batch_format="pyarrow")
    )
    merges = assigned.map_batches(split_merges, batch_format="pyarrow")
    return {"assignments": assignments, "merges": merges, "boundary": boundary}


def _exact_match_block(boundary: int):
    """Per-sha runs → (delta id, min base id with identical content).
    With append-only ids the run minimum is a base doc iff the run has any
    base member, so the match is the run's first id when it is < boundary."""

    def f(block: pa.Table) -> pa.Table:
        n = len(block)
        if n == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "matched_base_id": pa.array([], pa.int64()),
                }
            )
        sha = block.column("sha256").to_numpy(zero_copy_only=False)
        ids = block.column("id").to_numpy()
        order = np.lexsort((ids, sha))
        sha, ids = sha[order], ids[order]
        new_run = np.concatenate([[True], sha[1:] != sha[:-1]])
        run_id = np.cumsum(new_run) - 1
        firsts = ids[new_run]
        match = firsts[run_id]
        keep = (ids >= boundary) & (match < boundary)
        return pa.table(
            {
                "id": pa.array(ids[keep]),
                "matched_base_id": pa.array(match[keep]),
            }
        )

    return f


def incremental_exact_matches(
    all_sigs: "ray.data.Dataset", boundary: int
) -> "ray.data.Dataset":
    """Delta docs whose content byte-matches a base doc →
    (id, matched_base_id = min base id with that content). SQL-mirrorable
    (content-equality join), the oracle-checked face of the exact tier."""
    return grouped_blocks(
        all_sigs.select_columns(["sha256", "id"]), "sha256", _exact_match_block(boundary)
    )
