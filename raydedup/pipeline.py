"""The flagship near-duplicate detection + clustering pipeline.

Dataflow (all lazy Ray Data; one materialize at the signature checkpoint):

  corpus(id, repo, path, commit, lang, content)
    │ map_batches(SignatureStage)           [stateless, pyarrow, content dropped]
  sigs(id, …, sha256, minhash, kmv, simhash, winnow)
    ├─ groupby(sha256)                      → exact edges          (tier: exact)
    ├─ map_batches(hh partials) → driver merge → hot band keys     (skew pre-pass)
    ├─ map_batches(BandEmit[hot]) → groupby(band_key) → verified near edges
    │    └─ salted sub-buckets → delegate round → delegate edges
    ├─ flat_map(winnow fps) → groupby(fp) → pair counts → substring edges
    └─ edges ∪ … → union-find → (id, cluster_id)  [cluster = min member id]

Scale notes: the only all-to-alls are the band groupby (16 rows × ~1 KB per
doc), the fp groupby (≤ n_tokens/w rows × 16 B per doc) and the sha groupby
(1 row × 72 B); everything else is map-side. Verified edges are tiny.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .config import DEFAULT_CONFIG, SigConfig
from .lsh import band_hashes, make_band_key
from .sketches.freq import FrequentKeysSketch
from .stages import (
    BandEmitStage,
    SignatureStage,
    delegate_reducer,
    make_pair_emitter,
)
from .unionfind import cluster_edges

U64 = np.uint64


# ---------------------------------------------------------------------------
# exact tier
# ---------------------------------------------------------------------------


def _exact_group_edges(group: pa.Table) -> pa.Table:
    ids = np.sort(group.column("id").to_numpy())
    if len(ids) < 2:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "src": pa.array(np.full(len(ids) - 1, ids[0], dtype=np.int64)),
            "dst": pa.array(ids[1:]),
        }
    )


def exact_edges(sigs: "ray.data.Dataset") -> "ray.data.Dataset":
    """sha256-equality tier: star edges from the min id of each digest group."""
    return (
        sigs.select_columns(["sha256", "id"])
        .groupby("sha256")
        .map_groups(_exact_group_edges, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# heavy-hitter pre-pass over band keys (skew detection)
# ---------------------------------------------------------------------------


class BandKeyHHPartial:
    """Per-block Misra-Gries partial sketch of band-key frequencies; blocks
    merge on the driver (frequencies-sketch partial+final split)."""

    def __init__(self, cfg: SigConfig, map_size: int = 4096):
        self.cfg = cfg
        self.map_size = map_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return pa.table({"sketch": pa.array([], pa.large_binary())})
        mh = np.frombuffer(
            b"".join(batch.column("minhash").to_pylist()), dtype=np.uint64
        ).reshape(n, cfg.num_perm)
        nsh = batch.column("n_shingles").to_numpy()
        bh = band_hashes(mh, cfg.bands, cfg.rows_per_band, cfg.seed)
        sk = FrequentKeysSketch(self.map_size)
        valid = nsh > 0
        for b in range(cfg.bands):
            keys = make_band_key(np.full(n, b, dtype=np.uint64), bh[:, b])[valid]
            sk.update_many(keys.view(np.int64))
        return pa.table({"sketch": pa.array([sk.serialize()], pa.large_binary())})


def detect_hot_band_keys(sigs: "ray.data.Dataset", cfg: SigConfig) -> dict[int, int]:
    """Merged heavy-hitter pass → {band_key: n_salt_subbuckets}."""
    parts = sigs.map_batches(
        BandKeyHHPartial(cfg), batch_format="pyarrow", batch_size=4096
    ).take_all()
    merged = FrequentKeysSketch(4096)
    for row in parts:
        merged.merge(FrequentKeysSketch.deserialize(row["sketch"]))
    hot: dict[int, int] = {}
    for key, est in merged.get_frequent_items(cfg.max_bucket_size):
        n_salt = min(cfg.salt_factor, max(2, math.ceil(est / cfg.max_bucket_size)))
        hot[int(np.int64(key).view(np.uint64))] = n_salt
    return hot


# ---------------------------------------------------------------------------
# near tier
# ---------------------------------------------------------------------------


def join_partitions(wanted: int = 32) -> int:
    """Hash-join aggregator actors each need a CPU slot; requesting more
    partitions than the cluster has CPUs deadlocks scheduling. Clamp."""
    try:
        cpus = int(ray.available_resources().get("CPU", 1) or 1)
    except Exception:  # noqa: BLE001 — outside a Ray session
        cpus = 1
    return max(1, min(wanted, cpus))


def _banded(
    sigs: "ray.data.Dataset",
    cfg: SigConfig,
    hot: dict[int, int] | None,
    carry_kmv: bool,
    verify: bool,
) -> "ray.data.Dataset":
    cols = ["id", "minhash", "n_shingles"]
    if carry_kmv:
        cols += ["kmv_theta", "kmv"]
    band = sigs.select_columns(cols).map_batches(
        BandEmitStage(cfg, hot, carry_kmv=carry_kmv), batch_format="pyarrow"
    )
    emitter = make_pair_emitter(cfg, verify=verify, hot=hot)
    pairs = band.groupby("band_key").map_groups(emitter, batch_format="pyarrow")
    if hot:
        delegates = (
            band.filter(expr="salted == True")
            .groupby("band_key")
            .map_groups(delegate_reducer, batch_format="pyarrow")
        )
        d_pairs = delegates.groupby("band_key").map_groups(
            emitter, batch_format="pyarrow"
        )
        pairs = pairs.union(d_pairs)
    return pairs


def candidate_pairs_lsh(
    sigs: "ray.data.Dataset", cfg: SigConfig, hot: dict[int, int] | None = None
) -> "ray.data.Dataset":
    """LSH band shuffle → UNIQUE unverified candidate pairs (src, dst)."""
    pairs = _banded(sigs, cfg, hot, carry_kmv=False, verify=False)
    # pairs are already globally unique thanks to the owner-band rule
    # (delegate-bucket pairs may rarely duplicate a normal pair; harmless)
    return pairs.select_columns(["src", "dst"])


def verify_pairs(
    pairs: "ray.data.Dataset",
    sigs: "ray.data.Dataset",
    cfg: SigConfig,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Join each unique candidate pair with both KMV sketches and verify
    once (theta Jaccard, JaccardSimilarity.java:55-96 semantics)."""
    num_partitions = num_partitions or join_partitions()
    kmv_tbl = sigs.select_columns(["id", "kmv_theta", "kmv"])
    j1 = pairs.join(
        kmv_tbl, "inner", num_partitions=num_partitions, on=("src",), right_on=("id",)
    ).map_batches(
        lambda b: pa.table(
            {
                "src": b.column("src"),
                "dst": b.column("dst"),
                "theta_a": b.column("kmv_theta"),
                "kmv_a": b.column("kmv"),
            }
        ),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        kmv_tbl, "inner", num_partitions=num_partitions, on=("dst",), right_on=("id",)
    ).map_batches(
        lambda b: pa.table(
            {
                "src": b.column("src"),
                "dst": b.column("dst"),
                "theta_a": b.column("theta_a"),
                "kmv_a": b.column("kmv_a"),
                "theta_b": b.column("kmv_theta"),
                "kmv_b": b.column("kmv"),
            }
        ),
        batch_format="pyarrow",
    )
    from .stages import PairVerifyStage

    return j2.map_batches(
        PairVerifyStage(cfg), batch_format="pyarrow"
    ).select_columns(["src", "dst", "jaccard"])


def near_edges(
    sigs: "ray.data.Dataset",
    cfg: SigConfig,
    hot: dict[int, int] | None = None,
    num_partitions: int | None = None,
    mode: str = "bucket",
) -> "ray.data.Dataset":
    """Verified near-dup edges. mode='bucket' (default): single shuffle with
    in-bucket verification; mode='join': ids-only shuffle + dedup + hash-join
    verify (see BandEmitStage docstring for the trade-off)."""
    if mode == "bucket":
        edges = _banded(sigs, cfg, hot, carry_kmv=True, verify=True)
        return edges.select_columns(["src", "dst", "jaccard"])
    pairs = candidate_pairs_lsh(sigs, cfg, hot)
    return verify_pairs(pairs, sigs, cfg, num_partitions)


# ---------------------------------------------------------------------------
# substring tier (winnowing fingerprints)
# ---------------------------------------------------------------------------


def _explode_winnow(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    blobs = batch.column("winnow").to_pylist()
    out_fp, out_id = [], []
    for i, blob in enumerate(blobs):
        if not blob:
            continue
        arr = np.frombuffer(blob, dtype="<u8").reshape(-1, 2)
        fps = np.unique(arr[:, 0])
        out_fp.append(fps)
        out_id.append(np.full(len(fps), ids[i], dtype=np.int64))
    if not out_fp:
        return pa.table(
            {"fp": pa.array([], pa.uint64()), "id": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "fp": pa.array(np.concatenate(out_fp), type=pa.uint64()),
            "id": pa.array(np.concatenate(out_id)),
        }
    )


def _fp_bucket_pairs(max_bucket: int):
    def emit(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column("id").to_numpy())
        n = len(ids)
        if n < 2:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        if n > max_bucket:
            src = np.full(n - 1, ids[0], dtype=np.int64)
            dst = ids[1:]
        else:
            iu = np.triu_indices(n, k=1)
            src, dst = ids[iu[0]], ids[iu[1]]
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return emit


def substring_edges(sigs: "ray.data.Dataset", cfg: SigConfig) -> "ray.data.Dataset":
    """Pairs sharing enough winnow fingerprints to imply a verbatim block of
    >= min_substring_tokens tokens."""
    t = cfg.winnow_k + cfg.winnow_window - 1
    min_shared = max(1, (cfg.min_substring_tokens - t) // cfg.winnow_window)
    fp_rows = sigs.select_columns(["id", "winnow"]).map_batches(
        _explode_winnow, batch_format="pyarrow"
    )
    pairs = fp_rows.groupby("fp").map_groups(
        _fp_bucket_pairs(cfg.max_bucket_size), batch_format="pyarrow"
    )
    counted = pairs.groupby(["src", "dst"]).count()

    def keep_shared(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("count()"), min_shared)
        kept = batch.filter(mask)
        return pa.table({"src": kept.column("src"), "dst": kept.column("dst")})

    return counted.map_batches(keep_shared, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def _dedup_pairs(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def dedup_clusters(
    corpus: "ray.data.Dataset",
    cfg: SigConfig = DEFAULT_CONFIG,
    *,
    with_substring: bool = True,
    with_salting: bool = True,
    cluster_method: str = "auto",
) -> "ray.data.Dataset":
    """corpus → (id, cluster_id) assignment for every input row."""
    sigs = corpus.map_batches(
        SignatureStage(cfg), batch_format="pyarrow"
    ).materialize()  # signature checkpoint: every tier reads this

    hot = detect_hot_band_keys(sigs, cfg) if with_salting else None

    e_exact = exact_edges(sigs)
    e_near = near_edges(sigs, cfg, hot)
    edges = e_exact.union(e_near.select_columns(["src", "dst"]))
    if with_substring:
        edges = edges.union(substring_edges(sigs, cfg))
    # no (src,dst) dedup shuffle needed: the near tier's owner-band rule
    # makes its pairs unique, and union-find is idempotent under the few
    # cross-tier duplicates
    edges = edges.materialize()  # edge checkpoint: tiny; avoids re-running
    # the whole DAG for the count() + clustering consumers

    assigned = cluster_edges(edges, method=cluster_method)

    defaults = sigs.select_columns(["id"]).map_batches(
        lambda b: pa.table({"id": b.column("id"), "cluster_id": b.column("id")}),
        batch_format="pyarrow",
    )
    return (
        defaults.union(assigned)
        .groupby("id")
        .min("cluster_id")
        .map_batches(
            lambda b: pa.table(
                {"id": b.column("id"), "cluster_id": b.column("min(cluster_id)")}
            ),
            batch_format="pyarrow",
        )
    )


def signatures(
    corpus: "ray.data.Dataset", cfg: SigConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    return corpus.map_batches(SignatureStage(cfg), batch_format="pyarrow")


def containment_pairs(
    corpus: "ray.data.Dataset",
    cfg: SigConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int | None = None,
    concurrency: int | tuple[int, int] = 2,
) -> "ray.data.Dataset":
    """Verbatim-containment pairs: winnow candidates → content join →
    suffix-automaton LCS verify in an actor pool (the north_star's
    suffix-array stage). Returns (src, dst, lcs_tokens, contained) for pairs
    where the smaller doc (>= min_substring_tokens tokens) is a verbatim
    token run inside the larger."""
    from .suffix import LcsVerifier

    num_partitions = num_partitions or join_partitions(16)
    sigs = corpus.map_batches(SignatureStage(cfg), batch_format="pyarrow")
    cands = substring_edges(sigs, cfg)
    contents = corpus.select_columns(["id", "content"])
    j1 = cands.join(
        contents,
        "inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("id",),
        right_suffix="_a",
    )
    j1 = j1.map_batches(
        lambda b: pa.table(
            {"src": b.column("src"), "dst": b.column("dst"),
             "content_a": b.column("content")}
        ),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        contents,
        "inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("id",),
        right_suffix="_b",
    )
    j2 = j2.map_batches(
        lambda b: pa.table(
            {"src": b.column("src"), "dst": b.column("dst"),
             "content_a": b.column("content_a"), "content_b": b.column("content")}
        ),
        batch_format="pyarrow",
    )
    verified = j2.map_batches(
        LcsVerifier,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=512,
    )
    min_tok = cfg.min_substring_tokens
    return verified.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.equal(b.column("contained"), True),
                pc.greater_equal(b.column("lcs_tokens"), min_tok),
            )
        ),
        batch_format="pyarrow",
    )
