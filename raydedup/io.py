"""Parquet read wrapper: strip file-level schema metadata at the source.

Pandas-written parquet carries a ``b"pandas"`` schema-metadata blob; the
bundled pyarrow's ``Schema.__hash__`` raises ``TypeError: unhashable type:
'dict'`` on ANY schema with metadata, which disables Ray Data's schema
deduplication fast path and emits a ``Failed to hash the schemas`` warning
from every worker that concatenates raw-read blocks into batches.  Dropping
the metadata right at the read (a zero-copy ``replace_schema_metadata`` per
block, fused into the read stage with ``batch_size=None`` so blocks are
never re-chunked) makes every downstream schema hashable.  The metadata is
purely pandas index bookkeeping — no engine semantics depend on it.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _inject_stripped_schema(args: tuple, kwargs: dict) -> bool:
    """Set ``kwargs["schema"]`` to the files' physical schema minus metadata.

    Ray's parquet read task builds each output block with
    ``pa.Table.from_batches([batch], schema=schema)`` — with ``schema=None``
    the blocks inherit the file's pandas metadata INSIDE the read task, so a
    post-read strip stage can't stop the per-worker ``Failed to hash the
    schemas`` warning (``SplitBlocks`` prevents fusing the strip into the
    read). Passing a metadata-free schema fixes it at the source.

    Returns False (leaving kwargs untouched) whenever injection could change
    semantics: caller already passed schema/partitioning/_block_udf, a
    requested column is not in the physical file schema (it must then be a
    hive partition column ray materializes from the path), or schema
    discovery fails."""
    if any(k in kwargs for k in ("schema", "partitioning", "_block_udf")):
        return False
    paths = args[0] if args else kwargs.get("paths")
    if paths is None:
        return False
    try:
        import pyarrow.dataset as pads

        pa_ds = pads.dataset(
            paths, format="parquet", filesystem=kwargs.get("filesystem")
        )
        schema = pa_ds.schema.remove_metadata()
        cols = kwargs.get("columns")
        if cols:
            if any(c not in schema.names for c in cols):
                return False
            schema = pa.schema([schema.field(c) for c in cols])
        kwargs["schema"] = schema
        return True
    except Exception:
        return False


def read_parquet(*args, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with hashable (metadata-free) block schemas."""
    if _inject_stripped_schema(args, kwargs):
        return ray.data.read_parquet(*args, **kwargs)
    return ray.data.read_parquet(*args, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# broadcast handles — ray.put once, read zero-copy per actor, restart-safe
# ---------------------------------------------------------------------------

_BROADCAST_KEY = "__raydedup_broadcast__"


def put_broadcast(obj) -> dict:
    """``ray.put`` a broadcast object and wrap the ref in a tiny dict.

    Passing a bare ObjectRef (or a >100 KB by-value arg) in an actor pool's
    ``fn_constructor_args`` puts the constructor argument itself in the
    object store; with Ray Data's ``max_restarts > 0`` map actors, a lost
    primary copy then makes the actor UNRESTARTABLE mid-job (ray issue
    53727 — the ``core_worker.cc:2246`` error in every bench tail).  A ref
    nested inside a plain container is serialized by reference without
    becoming a task-spec dependency: the creation args stay inline (tiny),
    the broadcast payload still lives in plasma exactly once, and a
    restarted actor re-fetches it itself in ``__init__``."""
    import ray

    return {_BROADCAST_KEY: ray.put(obj)}


def broadcast_value(handle):
    """Resolve a :func:`put_broadcast` handle, a bare ObjectRef, or a plain
    value (tests construct stages directly with in-process arrays)."""
    import ray

    if isinstance(handle, dict) and _BROADCAST_KEY in handle:
        handle = handle[_BROADCAST_KEY]
    return ray.get(handle) if isinstance(handle, ray.ObjectRef) else handle
