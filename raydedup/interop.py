"""Cross-ecosystem wire formats: reference-compatible sketch images.

The engine's own storage is Parquet-native (compact numpy buffers), but
the reference ecosystem (Java/C++/Python datasketches) exchanges sketches
as versioned byte images. This module reads and writes those images so
sketches can cross the boundary in either direction.

Theta CompactSketch (theta/PreambleUtil.java:54-110): our ``KmvSketch`` is
exactly the compact-ordered form — ``(theta, sorted hashes < theta)`` —
so the mapping is a header plus the hash longs:

* empty            → 8 bytes,  preLongs=1, flags RO|EMPTY|COMPACT|ORDERED
* single item      → 16 bytes, preLongs=1, flags RO|COMPACT|ORDERED|SINGLEITEM
* exact, count > 1 → preLongs=2 (no theta long; theta == 2^63)
* estimating       → preLongs=3 (theta long at bytes 16-23)

Seed handshake: bytes 6-7 carry ``computeSeedHash(seed)``
(thetacommon/ThetaUtil.java:110-120, murmur3 of the seed long with seed 0);
our murmur3 reproduces the reference's hard-coded cross-language value
37836 for the default seed 9001 (tuple/CompactSketch.java:46).

Classic DoublesSketch images live in ``sketches/doubles.py``; KLL float
images in ``kll_from_reference_bytes`` below.
"""

from __future__ import annotations

import struct

import numpy as np

from .config import SketchesArgumentError
from .hashing import murmur3_128_flat
from .kmv import MAX_THETA, KmvSketch

DEFAULT_UPDATE_SEED = 9001

_SER_VER = 3
_FAMILY_COMPACT = 3

_BIG_ENDIAN_FLAG = 1
_READ_ONLY_FLAG = 2
_EMPTY_FLAG = 4
_COMPACT_FLAG = 8
_ORDERED_FLAG = 16
_SINGLEITEM_FLAG = 32


def compute_seed_hash(seed: int = DEFAULT_UPDATE_SEED) -> int:
    """ThetaUtil.computeSeedHash: low 16 bits of murmur3_128(seed-as-long,
    seed=0); zero is rejected (the wire uses it to mean 'no seed check')."""
    flat = np.frombuffer(struct.pack("<q", seed), dtype=np.uint8)
    off = np.array([0, 8], dtype=np.int64)
    h = int(murmur3_128_flat(flat, off, 0)[0][0]) & 0xFFFF
    if h == 0:
        raise SketchesArgumentError(f"seed {seed} produces a zero seed hash")
    return h


def theta_to_bytes(sk: KmvSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize to the reference's SerVer-3 compact-ordered theta image."""
    seed_hash = compute_seed_hash(seed)
    n = len(sk.hashes)
    if n == 0 and sk.theta == MAX_THETA:
        flags = _READ_ONLY_FLAG | _EMPTY_FLAG | _COMPACT_FLAG | _ORDERED_FLAG
        return struct.pack("<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, seed_hash)
    if n == 1 and sk.theta == MAX_THETA:
        flags = _READ_ONLY_FLAG | _COMPACT_FLAG | _ORDERED_FLAG | _SINGLEITEM_FLAG
        return struct.pack(
            "<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, seed_hash
        ) + np.ascontiguousarray(sk.hashes, dtype="<u8").tobytes()
    flags = _READ_ONLY_FLAG | _COMPACT_FLAG | _ORDERED_FLAG
    pre_longs = 2 if sk.theta == MAX_THETA else 3
    out = [
        struct.pack("<BBBBBBH", pre_longs, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, seed_hash),
        struct.pack("<iI", n, 0),  # retained count + p (unused for compact)
    ]
    if pre_longs == 3:
        out.append(np.array([sk.theta], dtype="<u8").tobytes())
    out.append(np.ascontiguousarray(np.sort(sk.hashes), dtype="<u8").tobytes())
    return b"".join(out)


def theta_from_bytes(
    raw: bytes, k: int | None = None, seed: int = DEFAULT_UPDATE_SEED
) -> KmvSketch:
    """Heapify a reference SerVer-3 theta CompactSketch image into a
    ``KmvSketch``. Compact images carry no nominal k, so ``k`` (for later
    set-op trims) defaults to the retained count (lossless)."""
    if len(raw) < 8:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 8")
    pre_longs_byte, ser_ver, family, _, _, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", raw, 0
    )
    pre_longs = pre_longs_byte & 0x3F
    if ser_ver in (1, 2):
        return _theta_from_legacy_bytes(raw, ser_ver, k, seed)
    if ser_ver != 3:
        raise SketchesArgumentError(f"unsupported theta SerVer: {ser_ver}")
    if family != _FAMILY_COMPACT:
        raise SketchesArgumentError(f"not a compact theta image (family {family})")
    if flags & _BIG_ENDIAN_FLAG:
        raise SketchesArgumentError("big-endian images not supported")
    if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
        raise SketchesArgumentError(
            f"seed hash mismatch: image {seed_hash} vs seed {seed}"
        )
    if flags & _EMPTY_FLAG:
        return KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=k or 1)
    if (flags & _SINGLEITEM_FLAG) or (pre_longs == 1 and len(raw) == 16):
        h = np.frombuffer(raw, dtype="<u8", count=1, offset=8).astype(np.uint64)
        return KmvSketch(theta=MAX_THETA, hashes=h, k=k or 1)
    (count,) = struct.unpack_from("<i", raw, 8)
    if pre_longs == 2:
        theta = MAX_THETA
        data_off = 16
    elif pre_longs == 3:
        theta = np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0]
        data_off = 24
    else:
        raise SketchesArgumentError(f"bad preamble longs for compact: {pre_longs}")
    hashes = np.frombuffer(raw, dtype="<u8", count=count, offset=data_off).astype(
        np.uint64
    )
    if not flags & _ORDERED_FLAG:
        hashes = np.sort(hashes)
    return KmvSketch(theta=np.uint64(theta), hashes=hashes, k=k or max(count, 1))


def _theta_from_legacy_bytes(
    raw: bytes, ser_ver: int, k: int | None, seed: int
) -> KmvSketch:
    """Forward-compatibility readers for the pre-2015 theta wire formats
    (layouts documented in the reference's test/theta/BackwardConversions.java:
    38-86 for SerVer 1 and :104-182 for SerVer 2; exercised there by
    ForwardCompatibilityTest). Both versions serialized only compact images
    with the hash longs starting right after the preamble."""
    pre_longs = raw[0] & 0x3F
    sk_type = raw[2]
    if sk_type != 3:  # SetSketch; Alpha/QS images were never compact exports
        raise SketchesArgumentError(f"unsupported legacy theta SkType {sk_type}")
    if ser_ver == 1:
        # V1: MD_LONGS always 3, no seedHash, flags(byte 6) carry no layout
        # info; empty <=> curCount==0 and theta==MAX.
        if pre_longs != 3 or len(raw) < 24:
            raise SketchesArgumentError("malformed SerVer-1 theta image")
        (count,) = struct.unpack_from("<i", raw, 8)
        theta = np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0]
        hashes = np.frombuffer(raw, dtype="<u8", count=count, offset=24).astype(np.uint64)
        return KmvSketch(theta=np.uint64(theta), hashes=hashes, k=k or max(count, 1))
    # V2: preLongs 1 (empty) / 2 (exact) / 3 (estimating); seedHash at 6-7.
    (seed_hash,) = struct.unpack_from("<H", raw, 6)
    if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
        raise SketchesArgumentError(
            f"seed hash mismatch: image {seed_hash} vs seed {seed}"
        )
    flags = raw[5]
    if pre_longs == 1 or flags & _EMPTY_FLAG:
        return KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=k or 1)
    (count,) = struct.unpack_from("<i", raw, 8)
    if pre_longs == 2:
        theta = MAX_THETA
        data_off = 16
    elif pre_longs == 3:
        theta = np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0]
        data_off = 24
    else:
        raise SketchesArgumentError(f"bad SerVer-2 preamble longs: {pre_longs}")
    hashes = np.frombuffer(raw, dtype="<u8", count=count, offset=data_off).astype(np.uint64)
    if flags & 16:  # UNORDERED flag (V2-specific)
        hashes = np.sort(hashes)
    return KmvSketch(theta=np.uint64(theta), hashes=hashes, k=k or max(count, 1))


# ---------------------------------------------------------------------------
# Tuple CompactSketch images (tuple/CompactSketch.java:43-148)
# ---------------------------------------------------------------------------

_FAMILY_TUPLE = 9
_SKTYPE_COMPACT = 1  # SerializerDeserializer.SketchType.CompactSketch ordinal

# reference Mode enum ordinals (tuple/aninteger/IntegerSummary.java:40-75,
# tuple/adouble/DoubleSummary.java:40-70) — same order as tuple.MODES
_MODE_NAMES = ("sum", "min", "max", "always_one", "increment")

# summary codecs: name -> (record bytes, numpy struct fields after the hash)
# int32      = 4-byte LE int, no mode byte (the C++ writer and the Java
#              TestIntegerSummary; tuple-int-*-cpp.sk)
# int32_mode = Java IntegerSummary: int32 + mode byte (IntegerSummary.java:130-140)
# double_mode= Java DoubleSummary: float64 + mode byte (DoubleSummary.java:130-140)
_SUMMARY_CODECS = {
    "int32": (4, [("v", "<i4")]),
    "int32_mode": (5, [("v", "<i4"), ("m", "u1")]),
    "double_mode": (9, [("v", "<f8"), ("m", "u1")]),
}

_TUPLE_EMPTY_FLAG = 4     # Flags.IS_EMPTY ordinal 2
_TUPLE_V3_FLAGS = 2 | 8 | 16  # READ_ONLY | COMPACT | ORDERED (matches C++ 0x1a)


def _tuple_codec(summary: str):
    try:
        return _SUMMARY_CODECS[summary]
    except KeyError:
        raise SketchesArgumentError(
            f"unknown summary codec {summary!r}; one of {sorted(_SUMMARY_CODECS)}"
        ) from None


def _mode_from_ordinals(modes: np.ndarray | None, default_mode: str) -> str:
    if modes is None or len(modes) == 0:
        return default_mode
    ordinal = int(modes[0])
    if ordinal >= len(_MODE_NAMES):
        raise SketchesArgumentError(f"unknown summary mode ordinal {ordinal}")
    return _MODE_NAMES[ordinal]


def tuple_from_bytes(raw: bytes, summary: str = "int32", k: int | None = None,
                     mode: str = "sum", seed: int = DEFAULT_UPDATE_SEED):
    """Heapify a reference tuple ``CompactSketch`` image (SerVer 1/2/3) into
    the engine's ``TupleSketch`` (scalar float64 summary column).

    * SerVer 3 (current; tuple/CompactSketch.java:121-148): 8-byte header
      with seed hash, optional count/theta by preamble longs, then
      interleaved (hash long, summary) records — the C++ cross-language
      form (tuple-int-*-cpp.sk golden files).
    * SerVer 2 (legacy :86-120): flags byte with HAS_ENTRIES/THETA_INCLUDED,
      hashes block then summaries block.
    * SerVer 1: SerVer 2 plus a length-prefixed summary class name.

    ``summary`` picks the summary codec; images without a mode byte take
    ``mode``. Mode ordinals map 1:1 onto the engine's ``MODES``.
    """
    from .sketches.tuple import TupleSketch

    if len(raw) < 8:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 8")
    _, sfields = _tuple_codec(summary)
    pre_longs, ser_ver, family, sktype = struct.unpack_from("<BBBB", raw, 0)
    if family != _FAMILY_TUPLE:
        raise SketchesArgumentError(f"not a tuple image (family {family})")
    if sktype != _SKTYPE_COMPACT:
        raise SketchesArgumentError(f"not a tuple CompactSketch (type {sktype})")
    if ser_ver > 3:
        raise SketchesArgumentError(f"unsupported tuple SerVer: {ser_ver}")
    rec = np.dtype([("h", "<u8")] + sfields)
    has_mode = any(f[0] == "m" for f in sfields)

    if ser_ver <= 2:  # legacy
        flags = raw[4]
        if flags & 1:
            raise SketchesArgumentError("big-endian images not supported")
        off = 5
        theta = MAX_THETA
        if flags & 8:  # IS_THETA_INCLUDED
            theta = np.frombuffer(raw, dtype="<u8", count=1, offset=off)[0]
            off += 8
        hashes = np.zeros(0, dtype=np.uint64)
        values = np.zeros((0, 1), dtype=np.float64)
        modes = None
        if flags & 4:  # HAS_ENTRIES
            if ser_ver == 1:
                name_len = raw[off]
                off += 1
            (count,) = struct.unpack_from("<i", raw, off)
            off += 4
            if ser_ver == 1:
                off += name_len
            hashes = np.frombuffer(raw, dtype="<u8", count=count, offset=off).astype(
                np.uint64
            )
            off += 8 * count
            summ = np.frombuffer(raw, dtype=np.dtype(sfields), count=count, offset=off)
            values = summ["v"].astype(np.float64).reshape(-1, 1)
            modes = summ["m"] if has_mode else None
    else:  # current v3
        flags = raw[5]
        seed_hash = struct.unpack_from("<H", raw, 6)[0]
        if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
            raise SketchesArgumentError(
                f"seed hash mismatch: image {seed_hash} vs seed {seed}"
            )
        theta = MAX_THETA
        if flags & _TUPLE_EMPTY_FLAG:
            count, off = 0, 8
        elif pre_longs == 1:
            count, off = 1, 8
        elif pre_longs == 2:
            (count,) = struct.unpack_from("<i", raw, 8)
            off = 16
        elif pre_longs == 3:
            (count,) = struct.unpack_from("<i", raw, 8)
            theta = np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0]
            off = 24
        else:
            raise SketchesArgumentError(f"bad tuple preamble longs: {pre_longs}")
        entries = np.frombuffer(raw, dtype=rec, count=count, offset=off)
        hashes = entries["h"].astype(np.uint64)
        values = entries["v"].astype(np.float64).reshape(-1, 1)
        modes = entries["m"] if has_mode else None

    order = np.argsort(hashes, kind="stable")
    return TupleSketch(
        theta=np.uint64(theta),
        hashes=hashes[order],
        values=values[order],
        k=k or max(len(hashes), 1),
        mode=_mode_from_ordinals(modes, mode),
    )


def tuple_to_bytes(sk, summary: str = "int32", seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize the engine's ``TupleSketch`` (scalar summary) to the
    reference's SerVer-3 compact image (tuple/CompactSketch.java:185-240)."""
    if sk.values.shape[1] != 1:
        raise SketchesArgumentError(
            f"wire tuple images carry scalar summaries; sketch has {sk.values.shape[1]}"
        )
    _, sfields = _tuple_codec(summary)
    has_mode = any(f[0] == "m" for f in sfields)
    seed_hash = compute_seed_hash(seed)
    n = len(sk.hashes)
    if n == 0 and sk.theta == MAX_THETA:
        return struct.pack(
            "<BBBBBBH", 1, 3, _FAMILY_TUPLE, _SKTYPE_COMPACT, 0,
            _TUPLE_V3_FLAGS | _TUPLE_EMPTY_FLAG, seed_hash,
        )
    estimating = sk.theta != MAX_THETA
    pre_longs = 3 if estimating else (1 if n == 1 else 2)
    rec = np.dtype([("h", "<u8")] + sfields)
    entries = np.zeros(n, dtype=rec)
    entries["h"] = sk.hashes
    entries["v"] = sk.values[:, 0]
    if has_mode:
        entries["m"] = _MODE_NAMES.index(sk.mode)
    out = [
        struct.pack(
            "<BBBBBBH", pre_longs, 3, _FAMILY_TUPLE, _SKTYPE_COMPACT, 0,
            _TUPLE_V3_FLAGS, seed_hash,
        )
    ]
    if pre_longs >= 2:
        out.append(struct.pack("<iI", n, 0))
    if pre_longs == 3:
        out.append(np.array([sk.theta], dtype="<u8").tobytes())
    out.append(entries.tobytes())
    return b"".join(out)


# ---------------------------------------------------------------------------
# KLL images (kll/KllPreambleUtil.java:130-160, kll/KllMemoryValidate.java:118-168)
# ---------------------------------------------------------------------------

_FAMILY_KLL = 15
_KLL_M = 8  # reference default/min level width (KllSketch.DEFAULT_M)

_KLL_EMPTY_FLAG = 1
_KLL_L0_SORTED_FLAG = 2
_KLL_SINGLE_FLAG = 4
_KLL_DOUBLES_FLAG = 8

_POW3 = [3**d for d in range(31)]


def _ref_level_capacity(k: int, num_levels: int, level: int, m: int = _KLL_M) -> int:
    """KllHelper.levelCapacity / intCapAux: round-half-up k*(2/3)^depth,
    computed in exact integer arithmetic like the reference."""
    depth = num_levels - level - 1
    if depth > 30:  # folded form, KllHelper.intCapAux:892-898
        half, rest = depth // 2, depth - depth // 2
        tmp = (((k << 1) << half) // _POW3[half] + 1) >> 1
        return max(m, (((tmp << 1) << rest) // _POW3[rest] + 1) >> 1)
    return max(m, (((k << 1) << depth) // _POW3[depth] + 1) >> 1)


def _ref_total_capacity(k: int, num_levels: int, m: int = _KLL_M) -> int:
    return sum(_ref_level_capacity(k, num_levels, lvl, m) for lvl in range(num_levels))


def kll_from_reference_bytes(raw: bytes):
    """Heapify a reference KLL floats/doubles image into the engine's
    ``KllSketch`` (float64). Layout per kll/KllPreambleUtil.java:130-160:

      byte 0: preamble ints, 1: SerVer, 2: FamID=15, 3: flags,
      4-5: k, 6: m, 7: unused; then for the full case
      8-15: n, 16-17: minK, 18: numLevels, 19: unused, levels array
      (numLevels ints compact / numLevels+1 updatable), min/max items,
      then the items, level 0 first at offset levels[0].

    The compact form's top fence is not stored — the reference recomputes
    it as computeTotalItemCapacity(k, m, numLevels)
    (KllMemoryValidate.java:131-134), reproduced by ``_ref_total_capacity``.
    SerVer 2 is the 12/16-byte single-item form; the golden v1 file
    (``kll_sketch_float_one_item_v1.sk``) is instead a full image with n=1.
    Items enter the engine sketch level-by-level so weights (2^level)
    are preserved.
    """
    from .sketches.kll import KllSketch

    if len(raw) < 8:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 8")
    _pre_ints, ser_ver, family, flags, k, m, _ = struct.unpack_from("<BBBBHBB", raw, 0)
    if family != _FAMILY_KLL:
        raise SketchesArgumentError(f"not a KLL image (family {family})")
    doubles = bool(flags & _KLL_DOUBLES_FLAG)
    item_ch, item_dtype, item_bytes = ("d", "<f8", 8) if doubles else ("f", "<f4", 4)
    item_fmt = "<" + item_ch
    sk = KllSketch(k)
    if flags & _KLL_EMPTY_FLAG:
        return sk
    if (flags & _KLL_SINGLE_FLAG) or ser_ver == 2:
        (item,) = struct.unpack_from(item_fmt, raw, 8)
        sk.update(float(item))
        return sk
    n, _min_k, num_levels = struct.unpack_from("<qHB", raw, 8)
    updatable = ser_ver == 3
    n_fence_ints = num_levels + 1 if updatable else num_levels
    levels = np.frombuffer(raw, dtype="<i4", count=n_fence_ints, offset=20).astype(
        np.int64
    )
    minmax_off = 20 + n_fence_ints * 4
    mn, mx = struct.unpack_from("<" + item_ch * 2, raw, minmax_off)
    items_off = minmax_off + 2 * item_bytes
    if updatable:
        fences = list(levels)
        stored = np.frombuffer(
            raw, dtype=item_dtype, count=int(fences[-1]), offset=items_off
        ).astype(np.float64)
        base = 0  # updatable stores the full capacity array incl. garbage gap
    else:
        fences = list(levels) + [_ref_total_capacity(k, num_levels, m)]
        stored = np.frombuffer(
            raw,
            dtype=item_dtype,
            count=int(fences[-1] - fences[0]),
            offset=items_off,
        ).astype(np.float64)
        base = int(fences[0])  # stored block starts at levels[0]
    for lvl in range(num_levels):
        items = stored[fences[lvl] - base : fences[lvl + 1] - base]
        if len(items) == 0:
            continue
        while lvl >= len(sk.levels):
            sk.levels.append(np.zeros(0, dtype=np.float64))
        sk.levels[lvl] = np.concatenate([sk.levels[lvl], items])
    sk.n = int(n)
    sk._min = float(mn)
    sk._max = float(mx)
    return sk


def kll_to_reference_bytes(sk) -> bytes:
    """Serialize the engine's ``KllSketch`` to the reference's compact
    *floats* image (SerVer 1/2 per state). Items are narrowed to float32.

    The compact top fence is implied — the reference recomputes capacity
    from (k, m, numLevels) — so retained items must fit under
    ``_ref_total_capacity``. The engine's in-memory capacity rule (ceil)
    can exceed the reference's (round-half-up) by a hair, in which case we
    run extra weight-preserving compactions before writing.
    """
    k = sk.k
    if sk.n == 0:
        return struct.pack(
            "<BBBBHBB", 2, 1, _FAMILY_KLL, _KLL_EMPTY_FLAG, k, _KLL_M, 0
        )
    if sk.n == 1:
        item = next(float(l[0]) for l in sk.levels if len(l))
        return struct.pack(
            "<BBBBHBBf", 2, 2, _FAMILY_KLL, _KLL_SINGLE_FLAG, k, _KLL_M, 0, item
        )
    levels = [np.asarray(l, dtype=np.float64).copy() for l in sk.levels]
    while len(levels) > 1 and len(levels[-1]) == 0:
        levels.pop()
    # weight-preserving compaction until retained fits the reference capacity
    while sum(map(len, levels)) > _ref_total_capacity(k, len(levels)):
        for i, lvl in enumerate(levels):
            if len(lvl) >= 2 and len(lvl) >= _ref_level_capacity(k, len(levels), i):
                srt = np.sort(lvl)
                leftover = srt[: len(srt) % 2]
                promoted = srt[len(srt) % 2 :][::2]
                if i + 1 == len(levels):
                    levels.append(np.zeros(0, dtype=np.float64))
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
                levels[i] = leftover
                break
        else:
            break
    num_levels = len(levels)
    cap = _ref_total_capacity(k, num_levels)
    fences = np.zeros(num_levels + 1, dtype=np.int64)
    fences[num_levels] = cap
    for i in range(num_levels - 1, -1, -1):
        fences[i] = fences[i + 1] - len(levels[i])
    if fences[0] < 0:
        raise SketchesArgumentError(
            f"retained {sum(map(len, levels))} exceeds reference capacity {cap}"
        )
    out = [
        struct.pack("<BBBBHBB", 5, 1, _FAMILY_KLL, 0, k, _KLL_M, 0),
        struct.pack("<qHBB", sk.n, k, num_levels, 0),
        np.ascontiguousarray(fences[:num_levels], dtype="<i4").tobytes(),
        struct.pack("<ff", sk._min, sk._max),
        np.concatenate(levels).astype("<f4").tobytes(),
    ]
    return b"".join(out)


# ---------------------------------------------------------------------------
# Theta UpdateSketch images: ALPHA (family 1) + QUICKSELECT (family 2)
# (HeapUpdateSketch.toByteArray:109-140, HeapAlphaSketch.java:234-253,
#  HeapQuickSelectSketch heapify — same 3-long preamble, then the live
#  open-addressing hash table of 2^lgArrLongs longs)
# ---------------------------------------------------------------------------

_FAMILY_ALPHA = 1
_FAMILY_QUICKSELECT = 2
_MIN_LG_ARR_LONGS = 5  # ThetaUtil.MIN_LG_ARR_LONGS


def _update_table_lg(count: int, lg_nom: int, estimating: bool) -> int:
    """Smallest lgArrLongs whose hashTableThreshold admits `count`
    (HeapAlphaSketch.setHashTableThreshold:574-577): fraction is
    RESIZE_THRESHOLD (1/2) below target size, REBUILD_THRESHOLD (15/16)
    at/above; sketch-mode tables are at target size lgNom+1 or larger."""
    lg = max(_MIN_LG_ARR_LONGS, lg_nom + 1 if estimating else _MIN_LG_ARR_LONGS)
    while True:
        frac = 0.5 if lg <= lg_nom else 15.0 / 16.0
        if count <= int(frac * (1 << lg)):
            return lg
        lg += 1


def _probe_table(keys: np.ndarray, lg_arr: int) -> np.ndarray:
    """Place keys into a reference open-addressing table
    (HashOperations.hashSearchOrInsert:129-148 probe sequence)."""
    from .interop_aod import _probe_slots

    table = np.zeros(1 << lg_arr, dtype=np.uint64)
    if len(keys):
        table[_probe_slots(np.asarray(keys, dtype=np.uint64), lg_arr)] = keys
    return table


def alpha_to_bytes(sk, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize an ``AlphaSketch`` to the reference's family-1 UpdateSketch
    image (rebuilds first, as HeapUpdateSketch.toByteArray:110 does)."""
    sk.rebuild()
    valid = np.array(sorted(sk._set), dtype=np.uint64)
    estimating = sk.is_estimation_mode
    lg_arr = _update_table_lg(len(valid), sk.lg_k, estimating)
    flags = 0 if not sk.empty else _EMPTY_FLAG
    lg_rf = 1  # X2 — the heapify's fallback for any inconsistent factor
    head = struct.pack(
        "<BBBBBBH",
        3 | (lg_rf << 6), _SER_VER, _FAMILY_ALPHA, sk.lg_k, lg_arr, flags,
        compute_seed_hash(seed),
    )
    body = struct.pack("<if", len(valid), sk.p)
    theta = np.array([sk.theta], dtype="<u8").tobytes()
    return head + body + theta + _probe_table(valid, lg_arr).astype("<u8").tobytes()


def _read_update_preamble(raw: bytes, want_family: int, seed: int):
    if len(raw) < 24:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 24")
    pre_byte, ser_ver, family, lg_nom, lg_arr, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", raw, 0
    )
    if (pre_byte & 0x3F) != 3:
        raise SketchesArgumentError(f"bad UpdateSketch preamble longs: {pre_byte & 0x3F}")
    if ser_ver != _SER_VER:
        raise SketchesArgumentError(f"unsupported UpdateSketch SerVer: {ser_ver}")
    if family != want_family:
        raise SketchesArgumentError(f"family mismatch: image {family} != {want_family}")
    if flags & _BIG_ENDIAN_FLAG:
        raise SketchesArgumentError("big-endian images not supported")
    if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
        raise SketchesArgumentError(
            f"seed hash mismatch: image {seed_hash} vs seed {seed}"
        )
    count, p = struct.unpack_from("<if", raw, 8)
    theta = int(np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0])
    if len(raw) < 24 + (8 << lg_arr):
        raise SketchesArgumentError("UpdateSketch image truncated")
    table = np.frombuffer(raw, dtype="<u8", count=1 << lg_arr, offset=24)
    return lg_nom, flags, count, p, theta, table.astype(np.uint64)


def alpha_from_bytes(raw: bytes, seed: int = DEFAULT_UPDATE_SEED):
    """Heapify a reference family-1 alpha image into a live ``AlphaSketch``
    (HeapAlphaSketch.heapifyInstance:128-155). Dirty entries (>= theta),
    possible in images of a live unrebuilt heap, are retained as dirty."""
    from .sketches.alpha import AlphaSketch

    lg_nom, flags, _, p, theta, table = _read_update_preamble(raw, _FAMILY_ALPHA, seed)
    sk = AlphaSketch(lg_k=lg_nom, p=float(p), seed=seed)
    sk.theta = theta
    sk.empty = bool(flags & _EMPTY_FLAG)
    entries = table[table != np.uint64(0)]
    for v in entries.tolist():
        sk._insert(v)
    sk.dirty = bool((entries >= np.uint64(min(theta, (1 << 63) - 1))).any()) and (
        theta < (1 << 63)
    )
    return sk


def quickselect_from_bytes(
    raw: bytes, seed: int = DEFAULT_UPDATE_SEED
) -> KmvSketch:
    """Heapify a reference family-2 QuickSelect UpdateSketch image into the
    engine's compact form (valid entries < theta, k = 2^lgNomLongs)."""
    lg_nom, flags, _, _, theta, table = _read_update_preamble(
        raw, _FAMILY_QUICKSELECT, seed
    )
    if flags & _EMPTY_FLAG:
        return KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=1 << lg_nom)
    valid = np.sort(table[(table != np.uint64(0)) & (table < np.uint64(theta))])
    return KmvSketch(theta=np.uint64(theta), hashes=valid, k=1 << lg_nom)


def quickselect_to_bytes(sk: KmvSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize a compact ``KmvSketch`` as a family-2 QuickSelect
    UpdateSketch image — an updatable heap a reference consumer can keep
    feeding (the inverse of a compact() handoff)."""
    lg_nom = max(int(np.ceil(np.log2(max(sk.k, 16)))), 4)
    estimating = sk.theta != MAX_THETA
    lg_arr = _update_table_lg(len(sk.hashes), lg_nom, estimating)
    flags = _EMPTY_FLAG if (len(sk.hashes) == 0 and not estimating) else 0
    head = struct.pack(
        "<BBBBBBH",
        3 | (1 << 6), _SER_VER, _FAMILY_QUICKSELECT, lg_nom, lg_arr, flags,
        compute_seed_hash(seed),
    )
    body = struct.pack("<if", len(sk.hashes), 1.0)
    theta = np.array([sk.theta], dtype="<u8").tobytes()
    return head + body + theta + _probe_table(sk.hashes, lg_arr).astype("<u8").tobytes()


# ---------------------------------------------------------------------------
# Theta set-operation images: UNION (family 4) + INTERSECTION (family 5)
# (theta/UnionImpl.java:276-286 — a QuickSelect gadget image with preLongs=4
#  and unionThetaLong at bytes 24-31; theta/IntersectionImpl.java:354-384 —
#  3-long preamble + the open-addressing table iff curCount > 0)
# ---------------------------------------------------------------------------

_FAMILY_UNION = 4
_FAMILY_INTERSECTION = 5


def theta_union_to_bytes(sk: KmvSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize a compact ``KmvSketch`` as a resumable reference Union
    image (family 4): the retained hashes become the gadget table and
    theta doubles as the union theta."""
    lg_nom = max(int(np.ceil(np.log2(max(sk.k, 16)))), 4)
    estimating = sk.theta != MAX_THETA
    lg_arr = _update_table_lg(len(sk.hashes), lg_nom, estimating)
    flags = _EMPTY_FLAG if (len(sk.hashes) == 0 and not estimating) else 0
    head = struct.pack(
        "<BBBBBBH",
        4 | (1 << 6), _SER_VER, _FAMILY_UNION, lg_nom, lg_arr, flags,
        compute_seed_hash(seed),
    )
    body = struct.pack("<if", len(sk.hashes), 1.0)
    thetas = np.array([sk.theta, sk.theta], dtype="<u8").tobytes()  # gadget + union
    return head + body + thetas + _probe_table(sk.hashes, lg_arr).astype("<u8").tobytes()


def theta_union_from_bytes(raw: bytes, seed: int = DEFAULT_UPDATE_SEED) -> KmvSketch:
    """Heapify a reference theta Union image: gadget entries below
    min(gadget theta, union theta) — UnionImpl.heapifyInstance:136-143 +
    getResult's min-theta rule."""
    if len(raw) < 32:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 32")
    pre_byte, ser_ver, family, lg_nom, lg_arr, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", raw, 0
    )
    if (pre_byte & 0x3F) != 4:
        raise SketchesArgumentError(f"bad Union preamble longs: {pre_byte & 0x3F}")
    if ser_ver != _SER_VER:
        raise SketchesArgumentError(f"unsupported Union SerVer: {ser_ver}")
    if family != _FAMILY_UNION:
        raise SketchesArgumentError(f"not a theta Union image (family {family})")
    if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
        raise SketchesArgumentError(
            f"seed hash mismatch: image {seed_hash} vs seed {seed}"
        )
    gadget_theta = int(np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0])
    union_theta = int(np.frombuffer(raw, dtype="<u8", count=1, offset=24)[0])
    theta = min(gadget_theta, union_theta)
    if flags & _EMPTY_FLAG:
        return KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=1 << lg_nom)
    if len(raw) < 32 + (8 << lg_arr):
        raise SketchesArgumentError("Union image truncated")
    table = np.frombuffer(raw, dtype="<u8", count=1 << lg_arr, offset=32).astype(np.uint64)
    valid = np.sort(table[(table != np.uint64(0)) & (table < np.uint64(theta))])
    return KmvSketch(theta=np.uint64(theta), hashes=valid, k=1 << lg_nom)


def theta_intersection_to_bytes(sk: KmvSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize as a reference Intersection image (family 5, preLongs=3,
    lgNomLongs byte unused) — a resumable intersect state whose current
    result is the sketch's retained set."""
    n = len(sk.hashes)
    lg_arr = _MIN_LG_ARR_LONGS
    while n > int((15.0 / 16.0) * (1 << lg_arr)):
        lg_arr += 1
    flags = _EMPTY_FLAG if (n == 0 and sk.theta == MAX_THETA) else 0
    head = struct.pack(
        "<BBBBBBH", 3, _SER_VER, _FAMILY_INTERSECTION, 0, lg_arr, flags,
        compute_seed_hash(seed),
    )
    body = struct.pack("<if", n, 1.0)
    theta = np.array([sk.theta], dtype="<u8").tobytes()
    if n == 0:
        return head + body + theta
    return head + body + theta + _probe_table(sk.hashes, lg_arr).astype("<u8").tobytes()


def theta_intersection_from_bytes(
    raw: bytes, seed: int = DEFAULT_UPDATE_SEED
) -> KmvSketch:
    """Heapify a reference Intersection image
    (IntersectionImpl.heapifyInstance:173-191). A virgin state
    (curCount == -1, no intersect calls yet) has no defined result and is
    rejected, as the reference's getResult does."""
    if len(raw) < 24:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 24")
    pre_byte, ser_ver, family, _, lg_arr, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", raw, 0
    )
    if (pre_byte & 0x3F) != 3:
        raise SketchesArgumentError(f"bad Intersection preamble longs: {pre_byte & 0x3F}")
    if ser_ver != _SER_VER:
        raise SketchesArgumentError(f"unsupported Intersection SerVer: {ser_ver}")
    if family != _FAMILY_INTERSECTION:
        raise SketchesArgumentError(f"not an Intersection image (family {family})")
    if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
        raise SketchesArgumentError(
            f"seed hash mismatch: image {seed_hash} vs seed {seed}"
        )
    count = struct.unpack_from("<i", raw, 8)[0]
    theta = int(np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0])
    if count < 0:
        raise SketchesArgumentError(
            "virgin Intersection image has no result (curCount == -1)"
        )
    if (flags & _EMPTY_FLAG) or count == 0:
        t = MAX_THETA if flags & _EMPTY_FLAG else np.uint64(theta)
        return KmvSketch(theta=t, hashes=np.zeros(0, dtype=np.uint64), k=max(count, 1))
    if len(raw) < 24 + (8 << lg_arr):
        raise SketchesArgumentError("Intersection image truncated")
    table = np.frombuffer(raw, dtype="<u8", count=1 << lg_arr, offset=24).astype(np.uint64)
    valid = np.sort(table[(table != np.uint64(0)) & (table < np.uint64(theta))])
    return KmvSketch(theta=np.uint64(theta), hashes=valid, k=max(len(valid), 1))


def heapify_sketch(raw: bytes, seed: int = DEFAULT_UPDATE_SEED):
    """Family-dispatch facade (the reference's ``Sketches.heapifySketch`` /
    ``SetOperation.heapify`` role): sniff the family byte and route to the
    right reader. Families 2-5 return the compact ``KmvSketch`` form;
    family 1 returns a live ``AlphaSketch``."""
    if len(raw) < 8:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 8")
    family = raw[2]
    if family == _FAMILY_ALPHA:
        return alpha_from_bytes(raw, seed)
    if family == _FAMILY_QUICKSELECT:
        return quickselect_from_bytes(raw, seed)
    if family == _FAMILY_COMPACT:
        return theta_from_bytes(raw, seed=seed)
    if family == _FAMILY_UNION:
        return theta_union_from_bytes(raw, seed)
    if family == _FAMILY_INTERSECTION:
        return theta_intersection_from_bytes(raw, seed)
    raise SketchesArgumentError(f"unsupported theta-domain family: {family}")
