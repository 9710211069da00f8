"""Snapshot diff — classify every document id across two corpus snapshots
as added / removed / changed / unchanged by content sha256 (the per-row
invariant of BASELINE.json). This is the bookkeeping pass a recurring
crawl needs before :mod:`raydedup.incremental` re-dedups the delta: it
tells you WHICH rows the delta actually is.

Semantics (mirrored exactly by the DuckDB oracle in __ray_entry__):

* ``added``     — id present only in the new snapshot;
* ``removed``   — id present only in the base snapshot;
* ``changed``   — id present in both with different content sha256;
* ``unchanged`` — id present in both with equal sha256.

Ids are assumed unique within each snapshot (the corpus contract).

Scale shape: each side computes (id, sha256) map-side — 72 B/row, never
the content — then ONE side-tagged hash-partitioned shuffle on id
(pipeline.grouped_blocks) classifies every id with a vectorized two-row
run scan. No driver state, no join operator, no content through the
shuffle.

The deterministic delta fixture (:func:`delta_sql`) plants all four
classes over the corpus view: ids % 19 == 0 removed, % 23 == 0 (and not
removed) content-mutated, plus fresh ids from ``documents``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .stages import _sha256_hex


def _tag(side: int, id_col: str, content_col: str):
    def go(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": batch.column(id_col),
                "h": _sha256_hex(
                    batch.column(content_col).combine_chunks()
                    if isinstance(batch.column(content_col), pa.ChunkedArray)
                    else batch.column(content_col)
                ),
                "side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int8)
                ),
            }
        )

    return go


def _classify_block(block: pa.Table) -> pa.Table:
    empty = pa.table(
        {"id": pa.array([], pa.int64()), "status": pa.array([], pa.string())}
    )
    n = block.num_rows
    if n == 0:
        return empty
    ids = block.column("id").to_numpy()
    side = block.column("side").to_numpy()
    h = np.asarray(block.column("h").to_pylist(), dtype=object)
    order = np.lexsort((side, ids))
    ids, side, h = ids[order], side[order], h[order]
    first = np.ones(n, dtype=bool)
    first[1:] = ids[1:] != ids[:-1]
    starts = np.flatnonzero(first)
    runs = np.diff(np.concatenate([starts, [n]]))
    out_ids = ids[starts]
    status = np.empty(len(starts), dtype=object)
    single = runs == 1
    # run of 1: base-only → removed, delta-only → added
    status[single] = np.where(
        side[starts[single]] == 0, "removed", "added"
    )
    if (runs > 2).any():
        bad = out_ids[runs > 2][:5].tolist()
        raise ValueError(
            "snapshot_diff: id duplicated within one snapshot (run > 2): "
            f"ids {bad} — ids must be unique per snapshot"
        )
    both = ~single  # run of 2, sorted (base, delta)
    b_idx = starts[both]
    # The run-of-2 classification is only sound when the two rows come
    # from OPPOSITE sides (one base, one delta). A same-side pair means a
    # duplicated id inside one snapshot — surface it instead of silently
    # labeling it changed/unchanged.
    if b_idx.size and not (
        (side[b_idx] == 0).all() and (side[b_idx + 1] == 1).all()
    ):
        viol = b_idx[(side[b_idx] != 0) | (side[b_idx + 1] != 1)]
        raise ValueError(
            "snapshot_diff: id duplicated within one snapshot: "
            f"ids {ids[viol][:5].tolist()} — ids must be unique per snapshot"
        )
    same = h[b_idx] == h[b_idx + 1]
    status[both] = np.where(same, "unchanged", "changed")
    return pa.table(
        {
            "id": pa.array(out_ids, pa.int64()),
            "status": pa.array(status.tolist(), pa.string()),
        }
    )


def snapshot_diff(
    base: "ray.data.Dataset",  # noqa: F821 - ray imported lazily
    new: "ray.data.Dataset",  # noqa: F821
    id_col: str = "id",
    content_col: str = "content",
) -> "ray.data.Dataset":
    """→ Dataset(id: int64, status: string) over the union of both
    snapshots' ids."""
    from .pipeline import grouped_blocks

    tagged = base.select_columns([id_col, content_col]).map_batches(
        _tag(0, id_col, content_col), batch_format="pyarrow"
    ).union(
        new.select_columns([id_col, content_col]).map_batches(
            _tag(1, id_col, content_col), batch_format="pyarrow"
        )
    )
    return grouped_blocks(tagged, "id", _classify_block)


# ---------------------------------------------------------------------------
# deterministic delta-snapshot fixture over the corpus view
# ---------------------------------------------------------------------------


def delta_sql(documents_rel: str = "documents") -> str:
    """The new-snapshot view as SQL over ``documents`` (fixture pattern of
    corpus.corpus_sql — executed identically by the engine-side builder
    and the DuckDB oracle). Relative to the corpus view: ids % 19 == 0
    removed, surviving ids % 23 == 0 content-mutated, fresh ids added.

    Fresh ids are offset by ``max(corpus.id) + 1`` (not a fixed constant)
    so they can never collide with real corpus ids at any scale factor —
    a collision would silently drop the 'added' class from the fixture."""
    from .corpus import corpus_sql

    return f"""
WITH corpus AS ({corpus_sql(documents_rel)})
SELECT id, content FROM corpus WHERE id % 19 != 0 AND id % 23 != 0
UNION ALL
SELECT id, content || ' updated content marker' FROM corpus
WHERE id % 19 != 0 AND id % 23 = 0
UNION ALL
SELECT doc_id + (SELECT max(id) + 1 FROM corpus), 'fresh addition ' || text
FROM {documents_rel}
WHERE doc_id % 31 = 0
"""


def delta_parquet_path(sf_dir: str) -> str:
    """Build (once, idempotently) the delta-snapshot parquet for a
    testdata dir. Concurrent-safe via atomic rename."""
    import hashlib
    import os

    from .corpus import SCRATCH_ROOT, _sf_tag

    # Fingerprint the fixture SQL into the cache path so an SQL change
    # invalidates stale fixtures (engine and oracle must see the same one).
    tag = hashlib.sha256(delta_sql().encode()).hexdigest()[:10]
    out_dir = os.path.join(SCRATCH_ROOT, "delta", f"{_sf_tag(sf_dir)}_{tag}")
    out = os.path.join(out_dir, "delta.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    tmp = out + f".tmp{os.getpid()}"
    con.execute(f"COPY ({delta_sql()}) TO '{tmp}' (FORMAT PARQUET)")
    os.replace(tmp, out)
    con.close()
    return out
