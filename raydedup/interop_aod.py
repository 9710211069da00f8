"""ArrayOfDoubles wire-format interop (SerVer-1 images, family 9).

The reference's ArrayOfDoubles tuple family serializes with its own direct
layout, distinct from the generic tuple CompactSketch handled by
``interop.tuple_to_bytes``:

* common preamble (``tuple/arrayofdoubles/ArrayOfDoublesSketch.java:42-62``):
  byte 0 preLongs (always 1), byte 1 serVer (1), byte 2 family (9 TUPLE),
  byte 3 sketchType (``tuple/SerializerDeserializer.java:34-35`` ordinals:
  2 = ArrayOfDoublesQuickSelectSketch, 3 = ArrayOfDoublesCompactSketch,
  4 = ArrayOfDoublesUnion), byte 4 flags (IS_BIG_ENDIAN=1,
  IS_IN_SAMPLING_MODE=2, IS_EMPTY=4, HAS_ENTRIES=8), byte 5 numValues,
  bytes 6-7 seedHash, bytes 8-15 thetaLong.
* compact (``DirectArrayOfDoublesCompactSketch.java:64-100``):
  retainedEntries:i32 at 16, 4 pad bytes, keys ``long[count]`` at 24, then
  values ``double[count*numValues]`` (all keys first, then all value rows).
* QuickSelect / updatable
  (``HeapArrayOfDoublesQuickSelectSketch.java:209-253``): lgNomEntries at
  16, lgCurCapacity at 17, lgResizeFactor at 18, samplingP:f32 at 20,
  retainedEntries:i32 at 24, then the FULL open-addressed hash table —
  keys ``long[1<<lgCurCapacity]`` at 32 (zero = empty slot) followed by
  values ``double[capacity*numValues]``. Heapify copies the table verbatim
  (no rehash), so the writer must place keys with the reference's probe
  sequence (``thetacommon/HashOperations.java:49-118``: start
  ``hash & mask``, stride ``2*((hash >>> lgCap) & 127) + 1``) for the image
  to stay updatable on the Java side.
* union (``ArrayOfDoublesUnion.java:194-206``): a 16-byte preamble
  (type 4, union thetaLong at 8, bytes 4-7 zero) followed by a complete
  QuickSelect gadget image. Pre-1.0 images lack the wrapper and are
  rejected by serVer/type checks
  (``HeapArrayOfDoublesUnion.heapifyUnion``, tested by
  ``ArrayOfDoublesUnionTest.noSupportHeapifyV0_9_1``).

Theta convention: the reference's exact-mode thetaLong is
``Long.MAX_VALUE`` (2^63-1); the engine's is 2^63. The codec maps between
the two at the boundary (estimates are unaffected; byte images match the
reference's).
"""

from __future__ import annotations

import struct

import numpy as np

from .config import SketchesArgumentError
from .interop import DEFAULT_UPDATE_SEED, compute_seed_hash
from .kmv import MAX_THETA
from .sketches.tuple import TupleSketch

AOD_FAMILY_ID = 9
_SER_VER = 1
_TYPE_QS = 2
_TYPE_COMPACT = 3
_TYPE_UNION = 4

_F_BIG_ENDIAN = 1
_F_SAMPLING = 2
_F_EMPTY = 4
_F_HAS_ENTRIES = 8

_REF_MAX_LONG = np.uint64((1 << 63) - 1)  # Long.MAX_VALUE
_MIN_LG_ARR = 5            # ThetaUtil.MIN_LG_ARR_LONGS
_LG_RESIZE = 3             # ArrayOfDoublesQuickSelectSketch.DEFAULT_LG_RESIZE_FACTOR
_REBUILD_NUM, _REBUILD_DEN = 15, 16  # ThetaUtil.REBUILD_THRESHOLD


def _theta_to_wire(theta: np.uint64) -> int:
    return int(_REF_MAX_LONG) if theta >= _REF_MAX_LONG else int(theta)


def _theta_from_wire(theta_long: int) -> np.uint64:
    t = np.uint64(theta_long)
    return MAX_THETA if t >= _REF_MAX_LONG else t


def _header(sktype: int, flags: int, num_values: int, seed_hash: int,
            theta: np.uint64) -> bytes:
    return struct.pack(
        "<BBBBBBHq", 1, _SER_VER, AOD_FAMILY_ID, sktype, flags,
        num_values, seed_hash, _theta_to_wire(theta),
    )


def _read_header(raw: bytes, want_type: int, seed: int):
    """Validates the common 16-byte preamble; returns
    (flags, num_values, theta)."""
    if len(raw) < 16:
        raise SketchesArgumentError("buffer too small for ArrayOfDoubles preamble")
    _pre, ser_ver, fam, sktype, flags, nv = struct.unpack_from("<6B", raw, 0)
    # version first, like HeapArrayOfDoublesUnion.heapifyUnion
    if ser_ver != _SER_VER:
        raise SketchesArgumentError(
            f"serial version mismatch: expected {_SER_VER}, actual {ser_ver}"
        )
    if fam != AOD_FAMILY_ID:
        raise SketchesArgumentError(f"not a tuple-family image (family {fam})")
    if sktype != want_type:
        raise SketchesArgumentError(
            f"sketch type mismatch: expected {want_type}, actual {sktype}"
        )
    if flags & _F_BIG_ENDIAN:
        raise SketchesArgumentError("big-endian images not supported")
    if not 1 <= nv <= 127:
        raise SketchesArgumentError(f"bad numValues {nv}")
    (seed_hash,) = struct.unpack_from("<H", raw, 6)
    if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
        raise SketchesArgumentError(
            f"seed hash mismatch: image {seed_hash} vs seed {seed}"
        )
    (theta_long,) = struct.unpack_from("<q", raw, 8)
    return flags, nv, _theta_from_wire(theta_long)


# ---------------------------------------------------------------------------
# compact

def aod_compact_to_bytes(sk: TupleSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize to the reference ArrayOfDoublesCompactSketch image."""
    n = len(sk.hashes)
    nv = sk.values.shape[1]
    is_empty = n == 0 and sk.theta == MAX_THETA
    flags = (_F_EMPTY if is_empty else 0) | (_F_HAS_ENTRIES if n > 0 else 0)
    out = _header(_TYPE_COMPACT, flags, nv, compute_seed_hash(seed), sk.theta)
    if n == 0:
        return out
    return (
        out
        + struct.pack("<iI", n, 0)  # retained + 4 pad bytes for alignment
        + np.ascontiguousarray(sk.hashes, dtype="<u8").tobytes()
        + np.ascontiguousarray(sk.values, dtype="<f8").tobytes()
    )


def aod_compact_from_bytes(raw: bytes, k: int | None = None, mode: str = "sum",
                           seed: int = DEFAULT_UPDATE_SEED) -> TupleSketch:
    flags, nv, theta = _read_header(raw, _TYPE_COMPACT, seed)
    if not flags & _F_HAS_ENTRIES:
        sk = TupleSketch.empty(k or 1, nv, mode)
        sk.theta = theta
        return sk
    (count,) = struct.unpack_from("<i", raw, 16)
    if len(raw) < 24 + count * (8 + 8 * nv):
        raise SketchesArgumentError("ArrayOfDoubles compact image truncated")
    keys = np.frombuffer(raw, dtype="<u8", count=count, offset=24).astype(np.uint64)
    values = (
        np.frombuffer(raw, dtype="<f8", count=count * nv, offset=24 + 8 * count)
        .astype(np.float64)
        .reshape(count, nv)
    )
    order = np.argsort(keys, kind="stable")
    return TupleSketch(theta, keys[order], values[order], k or max(count, 1), mode)


# ---------------------------------------------------------------------------
# QuickSelect (updatable hash-table image)

def _probe_slots(keys: np.ndarray, lg_cap: int) -> np.ndarray:
    """Reference open-addressing placement (HashOperations.hashInsertOnly):
    start ``hash & mask``, stride ``2*((hash >>> lgCap) & 127) + 1``."""
    cap = 1 << lg_cap
    mask = np.uint64(cap - 1)
    table = np.zeros(cap, dtype=np.uint64)
    slots = np.empty(len(keys), dtype=np.int64)
    strides = (2 * ((keys >> np.uint64(lg_cap)) & np.uint64(127)) + np.uint64(1))
    starts = keys & mask
    for i, (h, start, stride) in enumerate(
        zip(keys.tolist(), starts.tolist(), strides.tolist())
    ):
        cur = start
        while table[cur] != 0:
            cur = (cur + stride) & (cap - 1)
            if cur == start:
                raise SketchesArgumentError("no empty slot in table")
        table[cur] = h
        slots[i] = cur
    return slots


def _qs_lg_cur(count: int, lg_nom: int) -> int:
    lg = _MIN_LG_ARR
    while count > ((1 << lg) * _REBUILD_NUM) // _REBUILD_DEN and lg <= lg_nom:
        lg += 1
    return lg


def aod_qs_to_bytes(sk: TupleSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize to an updatable ArrayOfDoublesQuickSelectSketch image (a
    genuine probe-placed hash table, readable AND updatable by the
    reference)."""
    n = len(sk.hashes)
    nv = sk.values.shape[1]
    lg_nom = max(int(sk.k - 1).bit_length(), _MIN_LG_ARR - 1)
    if n > ((1 << (lg_nom + 1)) * _REBUILD_NUM) // _REBUILD_DEN:
        raise SketchesArgumentError(
            f"{n} retained entries exceed capacity for nominal 2^{lg_nom}"
        )
    lg_cur = _qs_lg_cur(n, lg_nom)
    cap = 1 << lg_cur
    is_empty = n == 0 and sk.theta == MAX_THETA
    flags = (_F_EMPTY if is_empty else 0) | (_F_HAS_ENTRIES if n > 0 else 0)
    out = bytearray(
        _header(_TYPE_QS, flags, nv, compute_seed_hash(seed), sk.theta)
    )
    out += struct.pack("<BBBxf", lg_nom, lg_cur, _LG_RESIZE, 1.0)
    out += struct.pack("<iI", n, 0)
    # the reference serializes the full table even when empty (its
    # getSerializedSizeBytes always includes capacity), keeping wrap valid
    keys = np.zeros(cap, dtype="<u8")
    values = np.zeros((cap, nv), dtype="<f8")
    if n > 0:
        slots = _probe_slots(np.asarray(sk.hashes, dtype=np.uint64), lg_cur)
        keys[slots] = sk.hashes
        values[slots] = sk.values
    return bytes(out) + keys.tobytes() + values.tobytes()


def aod_qs_from_bytes(raw: bytes, mode: str = "sum",
                      seed: int = DEFAULT_UPDATE_SEED) -> TupleSketch:
    """Heapify an updatable QuickSelect image (scans the full table like
    HeapArrayOfDoublesQuickSelectSketch's constructor + iterator)."""
    flags, nv, theta = _read_header(raw, _TYPE_QS, seed)
    if len(raw) < 32:
        raise SketchesArgumentError("buffer too small for QuickSelect preamble")
    lg_nom, lg_cur = struct.unpack_from("<BB", raw, 16)
    (count,) = struct.unpack_from("<i", raw, 24)
    k = 1 << lg_nom
    if count == 0 or not flags & _F_HAS_ENTRIES:
        sk = TupleSketch.empty(k, nv, mode)
        sk.theta = theta
        return sk
    cap = 1 << lg_cur
    if len(raw) < 32 + cap * (8 + 8 * nv):
        raise SketchesArgumentError("ArrayOfDoubles QuickSelect image truncated")
    keys = np.frombuffer(raw, dtype="<u8", count=cap, offset=32).astype(np.uint64)
    values = (
        np.frombuffer(raw, dtype="<f8", count=cap * nv, offset=32 + 8 * cap)
        .astype(np.float64)
        .reshape(cap, nv)
    )
    live = (keys != 0) & (keys < theta)
    keys, values = keys[live], values[live]
    if len(keys) != count:
        raise SketchesArgumentError(
            f"retained-count mismatch: preamble {count}, table {len(keys)}"
        )
    order = np.argsort(keys, kind="stable")
    return TupleSketch(theta, keys[order], values[order], k, mode)


# ---------------------------------------------------------------------------
# union

def aod_union_to_bytes(sk: TupleSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize union state: 16-byte union preamble wrapping a QuickSelect
    gadget image (ArrayOfDoublesUnion.toByteArray)."""
    pre = struct.pack(
        "<BBBBIq", 1, _SER_VER, AOD_FAMILY_ID, _TYPE_UNION, 0,
        _theta_to_wire(sk.theta),
    )
    return pre + aod_qs_to_bytes(sk, seed=seed)


def aod_union_from_bytes(raw: bytes, mode: str = "sum",
                         seed: int = DEFAULT_UPDATE_SEED) -> TupleSketch:
    """Heapify a union image. Pre-1.0 (v0.9.1) images lack the union
    wrapper — their byte 3 is the gadget's own sketch type — and are
    rejected exactly as the reference does
    (ArrayOfDoublesUnionTest.noSupportHeapifyV0_9_1)."""
    if len(raw) < 16:
        raise SketchesArgumentError("buffer too small for ArrayOfDoubles preamble")
    _pre, ser_ver, fam, sktype = struct.unpack_from("<4B", raw, 0)
    if ser_ver != _SER_VER:
        raise SketchesArgumentError(
            f"serial version mismatch: expected {_SER_VER}, actual {ser_ver}"
        )
    if fam != AOD_FAMILY_ID:
        raise SketchesArgumentError(f"not a tuple-family image (family {fam})")
    if sktype != _TYPE_UNION:
        raise SketchesArgumentError(
            f"sketch type mismatch: expected {_TYPE_UNION}, actual {sktype}"
        )
    (theta_long,) = struct.unpack_from("<q", raw, 8)
    union_theta = _theta_from_wire(theta_long)
    gadget = aod_qs_from_bytes(raw[16:], mode=mode, seed=seed)
    if union_theta < gadget.theta:
        keep = gadget.hashes < union_theta
        gadget = TupleSketch(
            union_theta, gadget.hashes[keep], gadget.values[keep],
            gadget.k, gadget.mode,
        )
    return gadget
