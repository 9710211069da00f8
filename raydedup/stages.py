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
  * Near-tier shuffle layout is switchable (see BandEmitStage): in-bucket
    verification with the KMV sketch carried in the band rows (one
    all-to-all; measured fastest here), or ids-only band rows with a
    dedup-then-hash-join verify (decouples shuffle volume from sketch
    size for very large kmv_k·bands). Both verify with the same theta
    Jaccard semantics.
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
    per-batch path, actor-pool style).

    ``normalizer``: optional pluggable content normalizer
    (pa.Array → pa.Array), the engine's user-extension point analogous to
    the reference's ArrayOfItemsSerDe (common/ArrayOfItemsSerDe.java:30-50)
    — e.g. per-language comment stripping or case folding. It must be a
    top-level callable (cloudpickled to workers)."""

    def __init__(self, cfg: SigConfig, normalizer=None):
        self.cfg = cfg
        self.normalizer = normalizer

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        content = batch.column("content")
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        content = pc.fill_null(content, "")  # null content ≡ empty file
        if self.normalizer is not None:
            content = self.normalizer(content)
        elif cfg.lowercase:
            content = pc.utf8_lower(content)

        flat_tok, tok_off = tokenize_hashes(content, seed=cfg.seed)
        sh, sh_off = shingle_hashes(flat_tok, tok_off, cfg.shingle_k, cfg.seed)
        uniq, uniq_off = segment_unique(sh, sh_off)

        mh = minhash_signatures(sh, sh_off, cfg.num_perm, cfg.seed)
        sim = simhash_signatures(sh, sh_off)

        # per-row KMV sketch in the theta domain (h >> 1, drop 0) —
        # theta/UpdateSketch.java:222 masking semantics
        theta_dom = uniq >> U64(1)
        kmv_blobs, thetas, n_retained = _kmv_blobs(
            theta_dom, uniq_off, cfg.kmv_k, cfg.kmv_hash_bytes
        )

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
        cols["minhash"] = _matrix_binary(mh)
        cols["kmv_theta"] = pa.array(thetas, type=pa.uint64())
        cols["kmv"] = kmv_blobs
        cols["winnow"] = _segments_binary(
            np.stack([wfp, wpos], axis=1).reshape(-1) if len(wfp) else wfp, w_off, 2
        )
        return pa.table(cols)


def _binary_from_segments(flat_bytes: np.ndarray, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy LargeBinaryArray over a flat uint8 buffer + int64 offsets."""
    n = len(byte_offsets) - 1
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(np.ascontiguousarray(byte_offsets, dtype=np.int64)),
         pa.py_buffer(np.ascontiguousarray(flat_bytes, dtype=np.uint8))],
    )


def _kmv_blobs(
    flat_sorted: np.ndarray, offsets: np.ndarray, k: int, hash_bytes: int = 8
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Per-row (theta, bottom-k hashes) from sorted-distinct segments —
    fully vectorized (single gather + one Arrow buffer, no per-row python)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    # drop the illegal 0 sentinel (sorted-first per row;
    # HashOperations.java:305)
    starts = offsets[:-1].copy()
    has_zero = (lens > 0) & (flat_sorted[np.minimum(starts, len(flat_sorted) - 1)] == U64(0)) if len(flat_sorted) else np.zeros(n, dtype=bool)
    starts = starts + has_zero
    eff_lens = lens - has_zero
    keep_lens = np.minimum(eff_lens, k)
    thetas = np.full(n, MAX_THETA, dtype=np.uint64)
    over = eff_lens > k
    if over.any():
        thetas[over] = flat_sorted[starts[over] + k]
    # gather the kept prefix of each segment
    out_off = np.concatenate([[0], np.cumsum(keep_lens)]).astype(np.int64)
    idx = np.repeat(starts, keep_lens) + _intra(keep_lens)
    if hash_bytes == 4:
        kept = (flat_sorted[idx] >> U64(32)).astype("<u4")
        # distinct 64-bit values can truncate to the same 32-bit cell; the
        # vectorized verifier (kmv_jaccard_many) requires sorted-UNIQUE
        # cells per sketch (an intra-sketch duplicate would count as a
        # false intersection), so dedupe adjacent within each row
        if len(kept):
            row_id = np.repeat(np.arange(n, dtype=np.int64), keep_lens)
            uniq = np.concatenate(
                [[True], (row_id[1:] != row_id[:-1]) | (kept[1:] != kept[:-1])]
            )
            kept = kept[uniq]
            dedup_lens = np.bincount(row_id[uniq], minlength=n)
            out_off = np.concatenate([[0], np.cumsum(dedup_lens)]).astype(np.int64)
        blobs = _binary_from_segments(kept.view(np.uint8), out_off * 4)
    else:
        kept = flat_sorted[idx].astype("<u8")
        blobs = _binary_from_segments(kept.view(np.uint8), out_off * 8)
    return blobs, thetas, lens


def _intra(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(seg_starts, counts)


def _segments_binary(flat: np.ndarray, offsets: np.ndarray, width: int) -> pa.Array:
    """Pack per-row u64 segments (width words per element) as binary cells."""
    offsets = np.asarray(offsets, dtype=np.int64)
    flat = np.ascontiguousarray(flat, dtype="<u8")
    return _binary_from_segments(flat.view(np.uint8), offsets * 8 * width)


def _matrix_binary(m: np.ndarray) -> pa.Array:
    """(n, w) uint64 matrix → n fixed-size binary cells, one buffer copy."""
    n, w = m.shape
    offsets = np.arange(n + 1, dtype=np.int64) * (8 * w)
    return _binary_from_segments(
        np.ascontiguousarray(m, dtype="<u8").view(np.uint8).reshape(-1), offsets
    )


# ---------------------------------------------------------------------------
# Band emission
# ---------------------------------------------------------------------------


class BandEmitStage:
    """sigs → (band_key, orig_key, salted, id[, kmv_theta, kmv]) rows.

    Two shuffle layouts (pipeline.near_edges mode):
      * carry_kmv=True (default, "bucket" mode): rows carry the KMV sketch
        (~kmv_k·8 B) so pairs verify inside the band groupby — one all-to-all
        total. Wins when sketches are small or bands few (measured best
        locally: the sketch payload shuffle is cheaper than a second shuffle
        + hash-join constant costs).
      * carry_kmv=False ("join" mode): rows are 3×u64 + bool; unique pairs
        are verified once via a hash join against the sigs checkpoint
        (pipeline.verify_pairs). Wins when kmv_k·bands is large relative to
        the dup rate (it decouples shuffle volume from sketch size).
    ``hot_keys``: dict band_key → n_salts from the heavy-hitter pre-pass;
    hot keys split by hash(id) into sub-buckets, reconnected by delegates.

    ``wave=(w, W)``: emit only band rows whose ORIGINAL band key hashes to
    wave ``w`` of ``W`` — the map-side shard filter behind
    pipeline's bucket_waves mode (each wave's band shuffle fits the object
    store instead of one monolithic sketch-carrying all-to-all). Keying on
    ``orig_key`` (not the salted sub-key) keeps every sub-bucket AND the
    delegate round of a hot key inside one wave, so cross-salt
    connectivity never spans waves. The filter runs before the bandhashes/
    kmv payload is gathered, so skipped rows never materialize their
    ~(bands·8 + kmv_k·hash_bytes) B payload.
    """

    #: wave-hash domain separator (any fixed odd-ish constant)
    WAVE_SEED = np.uint64(0x57A7E5EED)

    def __init__(
        self,
        cfg: SigConfig,
        hot_keys: dict[int, int] | None = None,
        carry_kmv: bool = True,
        carry_bandhashes: bool = True,
        wave: tuple[int, int] | None = None,
    ):
        self.cfg = cfg
        self.hot = hot_keys or {}
        self.carry_kmv = carry_kmv
        self.carry_bandhashes = carry_bandhashes
        self.wave = wave

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return _empty_band_table(self.carry_kmv, self.carry_bandhashes)
        mh_flat, _ = _binary_col_flat_u64(batch.column("minhash"))
        mh = mh_flat.reshape(n, cfg.num_perm)  # fixed-width cells, zero-copy
        ids = batch.column("id").to_numpy()
        nsh = batch.column("n_shingles").to_numpy()
        kmv_theta = batch.column("kmv_theta") if self.carry_kmv else None
        kmv_col = batch.column("kmv") if self.carry_kmv else None
        del batch  # only sig-derived columns leave this stage
        bh = band_hashes(mh, cfg.bands, cfg.rows_per_band, cfg.seed)
        keys = np.empty((n, cfg.bands), dtype=np.uint64)
        for b in range(cfg.bands):
            keys[:, b] = make_band_key(
                np.full(n, b, dtype=np.uint64), bh[:, b]
            )
        valid = nsh > 0  # zero-shingle rows never band (sentinel sigs collide)
        nv = int(valid.sum())
        rep_ids = np.repeat(ids[valid], cfg.bands)
        orig_keys = keys[valid].reshape(-1)
        band_idx = np.tile(np.arange(cfg.bands, dtype=np.uint8), nv)
        src_rows = np.repeat(np.flatnonzero(valid), cfg.bands)
        if self.wave is not None:
            w, n_waves = self.wave
            in_wave = (
                splitmix64(orig_keys ^ self.WAVE_SEED) % np.uint64(n_waves)
            ) == np.uint64(w)
            rep_ids = rep_ids[in_wave]
            orig_keys = orig_keys[in_wave]
            band_idx = band_idx[in_wave]
            src_rows = src_rows[in_wave]
        flat_keys, salted = self._salt(orig_keys, rep_ids)
        # when carry_bandhashes: every row carries the doc's band-hash
        # vector (bands×8 B) so the pair stage can assign each pair to its
        # FIRST co-bucketed band — exactly one bucket emits any given pair
        # (no dedup shuffle needed). Omitted in broadcast mode, where the
        # (small) pair set dedups on the driver instead.
        cols = {
            "band_key": pa.array(flat_keys, type=pa.uint64()),
            "orig_key": pa.array(orig_keys, type=pa.uint64()),
            "salted": pa.array(salted, type=pa.bool_()),
            "band_idx": pa.array(band_idx, type=pa.uint8()),
            "id": pa.array(rep_ids, type=pa.int64()),
        }
        if self.carry_bandhashes:
            cols["bandhashes"] = _matrix_binary(bh[src_rows])
        if self.carry_kmv:
            take = pa.array(src_rows)
            cols["kmv_theta"] = kmv_theta.take(take)
            cols["kmv"] = kmv_col.take(take)
        return pa.table(cols)

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


def _empty_band_table(carry_kmv: bool = False, carry_bandhashes: bool = True) -> pa.Table:
    """Empty block with EXACTLY the columns non-empty blocks emit for the
    active mode — a schema mismatch here breaks downstream groupby/union
    schema unification on corpora containing an empty shard."""
    cols = {
        "band_key": pa.array([], type=pa.uint64()),
        "orig_key": pa.array([], type=pa.uint64()),
        "salted": pa.array([], type=pa.bool_()),
        "band_idx": pa.array([], type=pa.uint8()),
        "id": pa.array([], type=pa.int64()),
    }
    if carry_bandhashes:
        cols["bandhashes"] = pa.array([], type=pa.large_binary())
    if carry_kmv:
        cols["kmv_theta"] = pa.array([], type=pa.uint64())
        cols["kmv"] = pa.array([], type=pa.large_binary())
    return pa.table(cols)


def delegate_reducer(group: pa.Table) -> pa.Table:
    """min-id row of a salted sub-bucket → delegate row keyed by orig_key.

    Delegates of one hot band key regroup (second, tiny shuffle) and pair
    among themselves, restoring connectivity across salt sub-buckets."""
    ids = group.column("id").to_numpy()
    i = int(np.argmin(ids))
    cols = {
        "band_key": group.column("orig_key").slice(i, 1),
        "orig_key": group.column("orig_key").slice(i, 1),
        "salted": pa.array([False]),
        # sentinel band_idx: delegate buckets bypass the owner-band rule
        # (their raison d'être is cross-salt pairs the rule would drop)
        "band_idx": pa.array(np.array([255], dtype=np.uint8)),
        "id": group.column("id").slice(i, 1),
    }
    if "bandhashes" in group.column_names:
        cols["bandhashes"] = group.column("bandhashes").slice(i, 1)
    for extra in ("kmv_theta", "kmv"):
        if extra in group.column_names:
            cols[extra] = group.column(extra).slice(i, 1)
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Candidate pairs + verification inside the band bucket
# ---------------------------------------------------------------------------


def _binary_col_flat_u64(arr: pa.Array, word_bytes: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """(flat words, element offsets in words) view of a large_binary column
    whose cells are fixed-width word sequences — zero-copy from Arrow
    buffers. ``word_bytes``: 8 (uint64) or 4 (uint32)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1]
    dt = np.uint64 if word_bytes == 8 else np.uint32
    data = np.frombuffer(bufs[2], dtype=dt) if bufs[2] is not None else np.zeros(0, dt)
    return data, (offsets // word_bytes).astype(np.int64)


def make_block_pair_emitter(
    cfg: SigConfig,
    verify: bool = True,
    hot: dict[int, int] | None = None,
    cross_min_id: int | None = None,
):
    """Block-level bucket processor for hash-partitioned band rows.

    Processes EVERY bucket in the block in one python call with all column
    data pre-extracted as flat numpy arrays (zero-copy from Arrow) —
    ``groupby().map_groups`` pays a python call + pyarrow slicing per group,
    which measured ~300 CPU-seconds across millions of small buckets.

    ``cross_min_id``: incremental-dedup filter — drop candidate pairs whose
    BOTH endpoints are below the boundary (base×base pairs already known
    from the base run) BEFORE the sketch verification, so an incremental
    run pays verify cost only for pairs touching new (delta) docs.
    """
    if hot:
        _ha = np.fromiter(hot.keys(), dtype=np.uint64, count=len(hot))
        _hs = np.fromiter(hot.values(), dtype=np.int64, count=len(hot))
        _o = np.argsort(_ha)
        hot_arr, hot_salts = _ha[_o], _hs[_o]
    else:
        hot_arr = hot_salts = None

    def emit_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _empty_pair_table(verify)
        keys = batch.column("band_key").to_numpy()
        ids_all = batch.column("id").to_numpy()
        order = np.lexsort((ids_all, keys))
        keys = keys[order]
        ids_all = ids_all[order]
        band_idx_all = batch.column("band_idx").to_numpy()[order]
        have_bh = "bandhashes" in batch.column_names
        if have_bh:
            bh_flat, bh_off = _binary_col_flat_u64(batch.column("bandhashes"))
            bands = cfg.bands
            # offset-safe gather (cells are uniform bands-word sequences)
            bh_mat = bh_flat[bh_off[:-1, None] + np.arange(bands)][order]
        if verify:
            kmv_flat, kmv_off = _binary_col_flat_u64(
                batch.column("kmv"), cfg.kmv_hash_bytes
            )
            thetas_all = batch.column("kmv_theta").to_numpy()[order]
            if cfg.kmv_hash_bytes == 4:
                thetas_all = (thetas_all >> U64(32)).astype(np.uint32)
            kstart = kmv_off[:-1][order]
            kend = kmv_off[1:][order]

        boundaries = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
        ends = np.concatenate([boundaries[1:], [n]])
        multi = (ends - boundaries) >= 2
        if not multi.any():
            return _empty_pair_table(verify)

        # pass 1: collect candidate pair row indices across ALL buckets
        cand_ra: list[np.ndarray] = []
        cand_rb: list[np.ndarray] = []
        cand_cap: list[np.ndarray] = []

        for s, e in zip(boundaries[multi], ends[multi]):
            seg_ids = ids_all[s:e]
            # rows sorted by id within the run → dedupe with a mask
            keep = np.concatenate([[True], seg_ids[1:] != seg_ids[:-1]])
            rows = np.flatnonzero(keep) + s  # absolute row index per member
            u = seg_ids[keep]
            m = len(u)
            if m < 2:
                continue
            if m <= cfg.max_bucket_size:
                ia, ib = np.triu_indices(m, k=1)
                capped = False
            else:
                # representative star over the WHOLE bucket: O(m) edges
                # keep every member connected to the min-id rep — capping
                # the star itself would silently drop members
                ia = np.zeros(m - 1, dtype=np.int64)
                ib = np.arange(1, m)
                capped = True
            my_band = int(band_idx_all[s])
            if my_band != 255 and have_bh and not capped:
                # owner-band pair uniqueness: exactly one (small) bucket
                # emits any given pair. Capped buckets skip the rule — the
                # election can point at a bucket that capped and never
                # emitted the pair, so star edges go out unconditionally
                # (a star pair may duplicate one owned elsewhere: bounded
                # by m per capped bucket and harmless to clustering).
                bh = bh_mat[rows]
                co = bh[ia] == bh[ib]
                if hot_arr is not None:
                    hotm, salts = _salt_slots(cfg, hot_arr, hot_salts, bh, u)
                    co &= (~hotm[ia]) | (salts[ia] == salts[ib])
                owner = np.argmax(co, axis=1)
                mask = (owner == my_band) & co[np.arange(len(ia)), owner]
                ia, ib = ia[mask], ib[mask]
                if len(ia) == 0:
                    continue
            cand_ra.append(rows[ia])
            cand_rb.append(rows[ib])
            cand_cap.append(np.full(len(ia), capped, dtype=bool))

        if not cand_ra:
            return _empty_pair_table(verify)
        ra = np.concatenate(cand_ra)
        rb = np.concatenate(cand_rb)
        cap = np.concatenate(cand_cap)
        src, dst = ids_all[ra], ids_all[rb]
        if cross_min_id is not None:
            cm = (src >= cross_min_id) | (dst >= cross_min_id)
            if not cm.any():
                return _empty_pair_table(verify)
            ra, rb, cap, src, dst = ra[cm], rb[cm], cap[cm], src[cm], dst[cm]
        if verify:
            # pass 2: ONE vectorized merge over all pairs in the block
            jac = kmv_jaccard_many(
                kmv_flat, kstart[ra], kend[ra], thetas_all[ra],
                kmv_flat, kstart[rb], kend[rb], thetas_all[rb],
                cfg.kmv_k,
            )
            km = jac >= cfg.verify_threshold
            if not km.any():
                return _empty_pair_table(verify)
            src, dst, jac, cap = src[km], dst[km], jac[km], cap[km]
        cols = {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
        }
        if verify:
            cols["jaccard"] = pa.array(jac)
        cols["capped"] = pa.array(cap, type=pa.bool_())
        return pa.table(cols)

    return emit_block


def _salt_slots(
    cfg: SigConfig,
    hot_arr: np.ndarray,
    hot_salts: np.ndarray,
    bh: np.ndarray,
    ids: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-(doc, band) hot flags + salt slots.

    ``hot_arr``: sorted hot band keys; ``hot_salts``: matching n_salt values.
    Returns (hot_mask (n, bands) bool, salts (n, bands) int64; 0 when cold).
    """
    n, bands = bh.shape
    hot_mask = np.zeros((n, bands), dtype=bool)
    salts = np.zeros((n, bands), dtype=np.int64)
    id_mix = splitmix64(ids.astype(np.uint64))
    for b in range(bands):
        keys = make_band_key(np.full(n, b, dtype=np.uint64), bh[:, b])
        idx = np.clip(np.searchsorted(hot_arr, keys), 0, len(hot_arr) - 1)
        is_hot = hot_arr[idx] == keys
        hot_mask[:, b] = is_hot
        if is_hot.any():
            ns = hot_salts[idx[is_hot]].astype(np.uint64)
            salts[is_hot, b] = 1 + (id_mix[is_hot] % ns).astype(np.int64)
    return hot_mask, salts


def _empty_pair_table(verify: bool = False) -> pa.Table:
    cols = {
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64()),
    }
    if verify:
        cols["jaccard"] = pa.array([], type=pa.float64())
    cols["capped"] = pa.array([], type=pa.bool_())
    return pa.table(cols)


class PairVerifyStage:
    """Batched KMV-Jaccard verification of joined candidate pairs.

    Input columns: src, dst, theta_a, kmv_a, theta_b, kmv_b. Output: pairs
    with jaccard >= cfg.jaccard_threshold. Point estimate per
    JaccardSimilarity.java:55-96 (exact when both sketches exact-mode)."""

    def __init__(self, cfg: SigConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return _empty_edge_table()
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        ta = batch.column("theta_a").to_numpy()
        tb = batch.column("theta_b").to_numpy()
        if cfg.kmv_hash_bytes == 4:
            ta = (ta >> U64(32)).astype(np.uint32)
            tb = (tb >> U64(32)).astype(np.uint32)
        fa, oa = _binary_col_flat_u64(batch.column("kmv_a"), cfg.kmv_hash_bytes)
        fb, ob = _binary_col_flat_u64(batch.column("kmv_b"), cfg.kmv_hash_bytes)
        out = kmv_jaccard_many(
            fa, oa[:-1], oa[1:], ta, fb, ob[:-1], ob[1:], tb, cfg.kmv_k
        )
        keep = out >= cfg.verify_threshold
        return pa.table(
            {
                "src": pa.array(src[keep]),
                "dst": pa.array(dst[keep]),
                "jaccard": pa.array(out[keep]),
                "capped": pa.array(np.zeros(int(keep.sum()), dtype=bool)),
            }
        )


def _kmv_jaccard_fast(
    theta_a: np.uint64, ha: np.ndarray, theta_b: np.uint64, hb: np.ndarray, k: int
) -> float:
    """Theta-sketch Jaccard point estimate (JaccardSimilarity.java:55-96
    semantics) on sorted arrays; exact when both sketches are exact-mode.
    Scalar reference for :func:`kmv_jaccard_many` (tests assert parity)."""
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


def kmv_jaccard_many(
    flat_a: np.ndarray,
    start_a: np.ndarray,
    end_a: np.ndarray,
    theta_a: np.ndarray,
    flat_b: np.ndarray,
    start_b: np.ndarray,
    end_b: np.ndarray,
    theta_b: np.ndarray,
    k: int,
) -> np.ndarray:
    """Vectorized theta-Jaccard for a BLOCK of pairs — one merge pass over
    all pairs' sketch cells instead of a python call (+ np.union1d on tiny
    arrays) per pair.

    Each pair p reads sorted-unique cells ``flat_a[start_a[p]:end_a[p]]``
    and ``flat_b[start_b[p]:end_b[p]]``. Semantics are exactly
    :func:`_kmv_jaccard_fast`: min-theta filter, cap at the k smallest
    merged values, |A∩B| / |A∪B| over the capped merged set."""
    P = len(start_a)
    if P == 0:
        return np.zeros(0, dtype=np.float64)
    la = (end_a - start_a).astype(np.int64)
    lb = (end_b - start_b).astype(np.int64)
    idx_a = np.repeat(start_a, la) + _intra(la)
    idx_b = np.repeat(start_b, lb) + _intra(lb)
    pair_ids = np.arange(P, dtype=np.int64)
    vals = np.concatenate(
        [
            flat_a[idx_a].astype(np.uint64, copy=False),
            flat_b[idx_b].astype(np.uint64, copy=False),
        ]
    )
    pair = np.concatenate([np.repeat(pair_ids, la), np.repeat(pair_ids, lb)])
    theta = np.minimum(
        np.asarray(theta_a, dtype=np.uint64), np.asarray(theta_b, dtype=np.uint64)
    )
    keep = vals < theta[pair]
    vals, pair = vals[keep], pair[keep]
    if len(vals) == 0:
        return np.zeros(P, dtype=np.float64)
    order = np.lexsort((vals, pair))
    pv, pp = vals[order], pair[order]
    new_pair = np.concatenate([[True], pp[1:] != pp[:-1]])
    uniq = new_pair | np.concatenate([[True], pv[1:] != pv[:-1]])
    dup = ~uniq  # same pair + same value → present on both sides
    u = np.cumsum(uniq)
    first_idx = np.flatnonzero(new_pair)
    base = u[first_idx] - 1
    seg_id = np.cumsum(new_pair) - 1
    rank = u - 1 - base[seg_id]  # 0-based rank within the pair's merged set
    in_cap = rank < k
    merged_cnt = np.bincount(pp[uniq & in_cap], minlength=P)
    inter_cnt = np.bincount(pp[dup & in_cap], minlength=P)
    return np.where(
        merged_cnt > 0, inter_cnt / np.maximum(merged_cnt, 1), 0.0
    ).astype(np.float64)


def _empty_edge_table() -> pa.Table:
    return pa.table(
        {
            "src": pa.array([], type=pa.int64()),
            "dst": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
            "capped": pa.array([], type=pa.bool_()),
        }
    )
