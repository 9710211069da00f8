"""REQ sketch wire-format interop (SerVer-1 float images).

Implements the reference REQ serialization (``req/ReqSerDe.java:36-263``;
family 17): the four formats EMPTY / RAWITEMS (n <= 4, raw floats) /
EXACT (single compactor) / ESTIMATION (preInts 4: N, min/max floats, then
per-compactor sections), with the per-compactor record
``(state:i64, sectionSizeFlt:f32, lgWt:u8, numSections:u8, pad:2,
count:i32, float[count])``. The wire item type is float32 (the reference
ReqSketch is float-only); the engine's float64 items are rounded on write
— documented lossy cast inherent to the format.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .config import SketchesArgumentError
from .sketches.req import ReqSketch, _Compactor

REQ_FAMILY_ID = 17
REQ_SER_VER = 1
_MIN_K_RAW = 4  # ReqSketch.MIN_K: at or below this n, RAWITEMS format

_EMPTY_FLAG = 4
_HRA_FLAG = 8
_RAW_ITEMS_FLAG = 16
_L0_SORTED_FLAG = 32


def req_to_bytes(sk: ReqSketch) -> bytes:
    k = sk.k
    flags = (_HRA_FLAG if sk.hra else 0)
    if sk.n == 0:
        out = bytearray(8)
        struct.pack_into("<4B", out, 0, 2, REQ_SER_VER, REQ_FAMILY_ID, flags | _EMPTY_FLAG)
        struct.pack_into("<H", out, 4, k)
        out[6] = 0  # numCompactors: 0 when empty (ReqSerDe.java:271)
        return bytes(out)
    if sk.n <= _MIN_K_RAW:
        raw = np.sort(sk.compactors[0].items).astype("<f4")
        out = bytearray(8 + 4 * len(raw))
        struct.pack_into(
            "<4B", out, 0, 2, REQ_SER_VER, REQ_FAMILY_ID, flags | _RAW_ITEMS_FLAG | _L0_SORTED_FLAG
        )
        struct.pack_into("<H", out, 4, k)
        out[6] = 1
        out[7] = len(raw)  # numRawItems
        out[8:] = raw.tobytes()
        return bytes(out)

    def compactor_record(c: _Compactor, lg_wt: int) -> bytes:
        items = np.asarray(c.items, dtype="<f4")
        head = struct.pack(
            "<qfBBHi", c.state, float(c.sec_size), lg_wt, c.num_sections, 0, len(items)
        )
        return head + items.tobytes()

    n_comp = len(sk.compactors)
    if n_comp == 1:  # EXACT
        out = bytearray(8)
        struct.pack_into("<4B", out, 0, 2, REQ_SER_VER, REQ_FAMILY_ID, flags)
        struct.pack_into("<H", out, 4, k)
        out[6] = 1
        return bytes(out) + compactor_record(sk.compactors[0], 0)
    # ESTIMATION
    out = bytearray(24)
    struct.pack_into("<4B", out, 0, 4, REQ_SER_VER, REQ_FAMILY_ID, flags)
    struct.pack_into("<H", out, 4, k)
    out[6] = n_comp
    struct.pack_into("<q", out, 8, sk.n)
    struct.pack_into("<2f", out, 16, sk._min, sk._max)
    return bytes(out) + b"".join(
        compactor_record(c, h) for h, c in enumerate(sk.compactors)
    )


def req_from_bytes(raw: bytes) -> ReqSketch:
    if len(raw) < 8:
        raise SketchesArgumentError("buffer too small for REQ preamble")
    pre_ints, ser_ver, fam_id, flags = struct.unpack_from("<4B", raw, 0)
    if ser_ver != REQ_SER_VER:
        raise SketchesArgumentError(f"unsupported REQ SerVer {ser_ver}")
    if fam_id != REQ_FAMILY_ID:
        raise SketchesArgumentError(f"not a REQ image (family {fam_id})")
    (k,) = struct.unpack_from("<H", raw, 4)
    n_comp = raw[6]
    n_raw = raw[7]
    hra = bool(flags & _HRA_FLAG)
    sk = ReqSketch(k, hra=hra)
    if flags & _EMPTY_FLAG:
        return sk
    if flags & _RAW_ITEMS_FLAG:
        items = np.frombuffer(raw, dtype="<f4", count=n_raw, offset=8)
        sk.update_many(items.astype(np.float64))
        return sk

    def read_compactor(off: int) -> tuple[_Compactor, int, int]:
        state, sec_size_f, lg_wt, num_sections, _pad, count = struct.unpack_from(
            "<qfBBHi", raw, off
        )
        off += 20
        items = np.frombuffer(raw, dtype="<f4", count=count, offset=off).astype(np.float64)
        c = _Compactor(int(round(sec_size_f)), hra, sk._rng)
        c.state = state
        c.num_sections = num_sections
        c.items = items
        return c, lg_wt, off + 4 * count

    if pre_ints == 2:  # EXACT: one compactor, N and min/max derived
        if n_comp != 1:
            raise SketchesArgumentError(f"EXACT format expects 1 compactor, got {n_comp}")
        c, _lg, _ = read_compactor(8)
        sk.compactors = [c]
        sk.n = len(c.items)
        sk._min = float(c.items.min()) if len(c.items) else math.inf
        sk._max = float(c.items.max()) if len(c.items) else -math.inf
        return sk
    if pre_ints != 4:
        raise SketchesArgumentError(f"bad REQ preInts {pre_ints}")
    (n,) = struct.unpack_from("<q", raw, 8)
    mn, mx = struct.unpack_from("<2f", raw, 16)
    off = 24
    comps: list[_Compactor] = []
    for i in range(n_comp):
        c, lg_wt, off = read_compactor(off)
        if lg_wt != i:
            raise SketchesArgumentError(f"non-contiguous compactor lgWt {lg_wt} at level {i}")
        comps.append(c)
    sk.compactors = comps
    sk.n = int(n)
    sk._min = float(mn)
    sk._max = float(mx)
    return sk
