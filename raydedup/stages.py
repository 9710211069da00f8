"""Ray Data map_batches stages (zero-copy Arrow in, Arrow out).

Stage layout (SURVEY §3.2 engine trace):

  read_parquet(corpus)
    → SignatureStage            (stateless map_batches, pyarrow)
    → [exact tier]   groupby(sha256)      → exact edges
    → [near tier]    band emission        → groupby(band_key ±salt)
                     → candidate pairs + in-bucket KMV verify → edges
    → [substring]    winnow fingerprints  → groupby(fp) → candidates
    → union-find     label propagation    → cluster_id

Design notes for 100 TB scale:
  * The signature stage reads ONLY (id, content, …) columns and drops
    ``content`` on output — everything downstream ships ≤ ~2 KB/row.
  * Band rows carry the (truncated) KMV sketch so candidate verification
    happens inside the band groupby — ONE all-to-all shuffle for the near
    tier, no sig joins. Pairs discovered in several bands deduplicate in the
    (tiny) edge dataset afterwards.
  * Hot band keys (boilerplate) are detected by a Misra-Gries heavy-hitter
    pre-pass (frequencies/LongsSketch.java:55-94 analog) and split into salt
    sub-buckets with a delegate round so connectivity survives
    (hllmap-tiered-promotion precedent, hllmap/UniqueCountMap.java:24-48).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .config import SigConfig
from .hashing import splitmix64, xxh64_u64s
from .kmv import MAX_THETA
from .lsh import band_hashes, make_band_key
from .minhash import EMPTY_SLOT, minhash_signatures
from .shingle import segment_unique, shingle_hashes
from .simhash import simhash_signatures
from .tokenize import tokenize_hashes
from .winnow import winnow_fingerprints

U64 = np.uint64


def _sha256_hex(content: pa.Array) -> pa.Array:
    # per-row C-speed digest; no vectorized sha256 exists in pyarrow
    return pa.array(
        [hashlib.sha256(s.as_py().encode()).hexdigest() for s in content],
        type=pa.string(),
    )


class SignatureStage:
    """content → signatures. Stateless; usable as a plain function in
    map_batches (class form keeps the config construction out of the
    per-batch path, actor-pool style)."""

    def __init__(self, cfg: SigConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        content = batch.column("content")
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()

        flat_tok, tok_off = tokenize_hashes(content, seed=cfg.seed)
        sh, sh_off = shingle_hashes(flat_tok, tok_off, cfg.shingle_k, cfg.seed)
        uniq, uniq_off = segment_unique(sh, sh_off)

        mh = minhash_signatures(sh, sh_off, cfg.num_perm, cfg.seed)
        sim = simhash_signatures(sh, sh_off)

        # per-row KMV sketch in the theta domain (h >> 1, drop 0) —
        # theta/UpdateSketch.java:222 masking semantics
        theta_dom = uniq >> U64(1)
        kmv_blobs, thetas, n_retained = _kmv_blobs(theta_dom, uniq_off, cfg.kmv_k)

        wfp, wpos, w_off = winnow_fingerprints(
            flat_tok, tok_off, cfg.winnow_k, cfg.winnow_window, cfg.seed
        )

        n = len(batch)
        cols: dict[str, pa.Array] = {}
        for name in ("id", "repo", "path", "commit", "lang"):
            if name in batch.column_names:
                cols[name] = batch.column(name)
        cols["sha256"] = _sha256_hex(content)
        cols["n_tokens"] = pa.array(np.diff(tok_off).astype(np.int32))
        cols["n_shingles"] = pa.array(np.diff(uniq_off).astype(np.int32))
        cols["simhash"] = pa.array(sim.astype(np.uint64), type=pa.uint64())
        cols["minhash"] = pa.array(
            [mh[i].tobytes() for i in range(n)], type=pa.large_binary()
        )
        cols["kmv_theta"] = pa.array(thetas, type=pa.uint64())
        cols["kmv"] = kmv_blobs
        cols["winnow"] = _segments_binary(
            np.stack([wfp, wpos], axis=1).reshape(-1) if len(wfp) else wfp, w_off, 2
        )
        return pa.table(cols)


def _kmv_blobs(
    flat_sorted: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Per-row (theta, bottom-k hashes) from sorted-distinct segments."""
    n = len(offsets) - 1
    lens = np.diff(offsets)
    thetas = np.full(n, MAX_THETA, dtype=np.uint64)
    blobs = []
    for i in range(n):
        seg = flat_sorted[offsets[i] : offsets[i + 1]]
        if len(seg) and seg[0] == U64(0):
            seg = seg[1:]  # 0 is an illegal sentinel (HashOperations.java:305)
        if len(seg) > k:
            thetas[i] = seg[k]
            seg = seg[:k]
        blobs.append(seg.astype("<u8").tobytes())
    return pa.array(blobs, type=pa.large_binary()), thetas, lens


def _segments_binary(flat: np.ndarray, offsets: np.ndarray, width: int) -> pa.Array:
    """Pack per-row u64 segments (width words per element) as binary cells."""
    out = []
    flat = np.ascontiguousarray(flat, dtype="<u8")
    for i in range(len(offsets) - 1):
        out.append(flat[offsets[i] * width : offsets[i + 1] * width].tobytes())
    return pa.array(out, type=pa.large_binary())


# ---------------------------------------------------------------------------
# Band emission
# ---------------------------------------------------------------------------


class BandEmitStage:
    """sigs → (band_key, id, kmv_theta, kmv) rows, bands*n per batch.

    ``hot_keys``/``hot_salts``: optional dict band_key → n_salts from the
    heavy-hitter pre-pass; hot keys are split by hash(id) into sub-buckets
    and each member additionally emits a delegate row (salt slot 0xFFFF) iff
    it is its sub-bucket's minimum — done lazily in the pair stage instead,
    so here hot rows just get salted keys.
    """

    def __init__(self, cfg: SigConfig, hot_keys: dict[int, int] | None = None):
        self.cfg = cfg
        self.hot = hot_keys or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return _empty_band_table()
        mh = np.frombuffer(
            b"".join(batch.column("minhash").to_pylist()), dtype=np.uint64
        ).reshape(n, cfg.num_perm)
        ids = batch.column("id").to_numpy()
        nsh = batch.column("n_shingles").to_numpy()
        bh = band_hashes(mh, cfg.bands, cfg.rows_per_band, cfg.seed)
        keys = np.empty((n, cfg.bands), dtype=np.uint64)
        for b in range(cfg.bands):
            keys[:, b] = make_band_key(
                np.full(n, b, dtype=np.uint64), bh[:, b]
            )
        valid = nsh > 0  # zero-shingle rows never band (sentinel sigs collide)
        rep_ids = np.repeat(ids[valid], cfg.bands)
        orig_keys = keys[valid].reshape(-1)
        flat_keys, salted = self._salt(orig_keys, rep_ids)
        reps = np.repeat(np.flatnonzero(valid), cfg.bands)
        kmv_col = batch.column("kmv").take(pa.array(reps))
        theta_col = batch.column("kmv_theta").take(pa.array(reps))
        return pa.table(
            {
                "band_key": pa.array(flat_keys, type=pa.uint64()),
                "orig_key": pa.array(orig_keys, type=pa.uint64()),
                "salted": pa.array(salted, type=pa.bool_()),
                "id": pa.array(rep_ids, type=pa.int64()),
                "kmv_theta": theta_col,
                "kmv": kmv_col,
            }
        )

    def _salt(self, keys: np.ndarray, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if not self.hot:
            return keys, np.zeros(len(keys), dtype=bool)
        out = keys.copy()
        # vectorized membership: sorted hot-key lookup
        hot_arr = np.fromiter(self.hot.keys(), dtype=np.uint64, count=len(self.hot))
        hot_salts = np.fromiter(self.hot.values(), dtype=np.int64, count=len(self.hot))
        order = np.argsort(hot_arr)
        hot_arr, hot_salts = hot_arr[order], hot_salts[order]
        idx = np.searchsorted(hot_arr, keys)
        idx = np.clip(idx, 0, len(hot_arr) - 1)
        is_hot = hot_arr[idx] == keys
        if is_hot.any():
            s = hot_salts[idx[is_hot]].astype(np.uint64)
            salt = splitmix64(ids[is_hot].astype(np.uint64)) % s
            # sub-bucket key; cross-salt connectivity restored by the
            # delegate round in pipeline.py (min-id per sub-bucket regroups
            # under orig_key)
            out[is_hot] = splitmix64(keys[is_hot] ^ (salt + U64(0xABCD0001)))
        return out, is_hot


def _empty_band_table() -> pa.Table:
    return pa.table(
        {
            "band_key": pa.array([], type=pa.uint64()),
            "orig_key": pa.array([], type=pa.uint64()),
            "salted": pa.array([], type=pa.bool_()),
            "id": pa.array([], type=pa.int64()),
            "kmv_theta": pa.array([], type=pa.uint64()),
            "kmv": pa.array([], type=pa.large_binary()),
        }
    )


def delegate_reducer(group: pa.Table) -> pa.Table:
    """min-id row of a salted sub-bucket → delegate row keyed by orig_key.

    Delegates of one hot band key regroup (second, tiny shuffle) and pair
    among themselves, restoring connectivity across salt sub-buckets."""
    ids = group.column("id").to_numpy()
    i = int(np.argmin(ids))
    return pa.table(
        {
            "band_key": group.column("orig_key").slice(i, 1),
            "orig_key": group.column("orig_key").slice(i, 1),
            "salted": pa.array([False]),
            "id": group.column("id").slice(i, 1),
            "kmv_theta": group.column("kmv_theta").slice(i, 1),
            "kmv": group.column("kmv").slice(i, 1),
        }
    )


# ---------------------------------------------------------------------------
# Candidate pairs + verification inside the band bucket
# ---------------------------------------------------------------------------


def make_pair_emitter(cfg: SigConfig):
    """map_groups fn over a band bucket → verified candidate edges.

    Bucket policy (skew ladder):
      size ≤ max_bucket_size    : all pairs, KMV-verified here.
      ≤ bucket_ceiling          : representative star — every member vs the
                                  min-id member only (linear).
      > bucket_ceiling          : star against min-id, sampled members
                                  (cap), logged via the 'capped' column.
    """

    thr = cfg.jaccard_threshold
    kmv_k = cfg.kmv_k

    def emit(group: pa.Table) -> pa.Table:
        n = len(group)
        if n < 2:
            return _empty_edge_table()
        ids = group.column("id").to_numpy()
        thetas = group.column("kmv_theta").to_numpy()
        blobs = group.column("kmv").to_pylist()
        order = np.argsort(ids)
        ids, thetas = ids[order], thetas[order]
        blobs = [blobs[i] for i in order]
        # dedupe same doc appearing twice in a bucket (can't happen per band,
        # but buckets merge bands after salting)
        keep = np.concatenate([[True], ids[1:] != ids[:-1]])
        ids, thetas = ids[keep], thetas[keep]
        blobs = [b for b, k0 in zip(blobs, keep) if k0]
        n = len(ids)
        if n < 2:
            return _empty_edge_table()
        sketches = [np.frombuffer(b, dtype="<u8") for b in blobs]

        if n <= cfg.max_bucket_size:
            pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
            capped = False
        else:
            limit = min(n, cfg.bucket_ceiling)
            pairs = [(0, j) for j in range(1, limit)]
            capped = True

        la, lb, ja = [], [], []
        for i, j in pairs:
            est = _kmv_jaccard_fast(
                thetas[i], sketches[i], thetas[j], sketches[j], kmv_k
            )
            if est >= thr:
                la.append(ids[i])
                lb.append(ids[j])
                ja.append(est)
        return pa.table(
            {
                "src": pa.array(la, type=pa.int64()),
                "dst": pa.array(lb, type=pa.int64()),
                "jaccard": pa.array(ja, type=pa.float64()),
                "capped": pa.array([capped] * len(la), type=pa.bool_()),
            }
        )

    return emit


def _kmv_jaccard_fast(
    theta_a: np.uint64, ha: np.ndarray, theta_b: np.uint64, hb: np.ndarray, k: int
) -> float:
    """Theta-sketch Jaccard point estimate (JaccardSimilarity.java:55-96
    semantics) on sorted arrays; exact when both sketches are exact-mode."""
    theta = theta_a if theta_a < theta_b else theta_b
    merged = np.union1d(ha, hb)
    if theta < MAX_THETA:
        merged = merged[merged < theta]
    if len(merged) > k:
        merged = merged[:k]
    if len(merged) == 0:
        return 0.0
    inter = np.count_nonzero(
        np.isin(merged, ha, assume_unique=True)
        & np.isin(merged, hb, assume_unique=True)
    )
    return inter / len(merged)


def _empty_edge_table() -> pa.Table:
    return pa.table(
        {
            "src": pa.array([], type=pa.int64()),
            "dst": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
            "capped": pa.array([], type=pa.bool_()),
        }
    )
