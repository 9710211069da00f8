"""Sampling-sketch wire-format interop (SerVer-1/2 images, longs payload).

Reservoir: the ``ReservoirLongsSketch`` layout (``sampling/PreambleUtil.java:
53-62``; family 11): 1 preamble long when empty, else 2 — byte 0 preLongs,
byte 1 serVer (2; serVer 1 stored a 16-bit K, also read here), byte 2
family, byte 3 flags (EMPTY=4), bytes 4-7 K, bytes 8-15 N, then the sample
longs.

VarOpt: the ``VarOptItemsSketch`` layout with the ``ArrayOfLongsSerDe``
payload (``sampling/PreambleUtil.java:88-101``, ``VarOptItemsSketch.java:
548-622``; family 13): preLongs 1 (empty) / 3 (warm-up, R empty) / 4
(full) — N at 8, H/R region counts at 16/20, total R weight at 24 (full
only), then the H-region weights as doubles, then the H+R items as longs.
The GADGET mark-bytes variant (union gadget state) is rejected on read and
never written.
"""

from __future__ import annotations

import struct

import numpy as np

from .config import SketchesArgumentError
from .sketches.sampling import ReservoirSketch, VarOptItemsSketch

RESERVOIR_FAMILY_ID = 11
VAROPT_FAMILY_ID = 13
_RESERVOIR_SER_VER = 2
_VAROPT_SER_VER = 2
_EMPTY_FLAG = 4
_GADGET_FLAG = 8


# ---------------------------------------------------------------------------
# reservoir (longs)

def reservoir_longs_to_bytes(sk: ReservoirSketch) -> bytes:
    if sk.n == 0:
        out = bytearray(8)
        struct.pack_into("<4B", out, 0, 1, _RESERVOIR_SER_VER, RESERVOIR_FAMILY_ID, _EMPTY_FLAG)
        struct.pack_into("<i", out, 4, sk.k)
        return bytes(out)
    samples = np.asarray(sk.samples, dtype=np.int64)
    out = bytearray(16 + 8 * len(samples))
    struct.pack_into("<4B", out, 0, 2, _RESERVOIR_SER_VER, RESERVOIR_FAMILY_ID, 0)
    struct.pack_into("<i", out, 4, sk.k)
    struct.pack_into("<q", out, 8, sk.n)
    out[16:] = samples.astype("<i8").tobytes()
    return bytes(out)


_RS_BINS_PER_OCTAVE = 2048  # ReservoirSize.BINS_PER_OCTAVE
_RS_MAX_ENC = 0xF7FF  # p=30, i=2047 (ReservoirSize.MAX_ENC_VALUE)


def _reservoir_size_encode(k: int) -> int:
    """ReservoirSize.computeSize: smallest representable size >= k as
    exponent(5b)<<11 | mantissa-bin index(11b)."""
    if not 1 <= k <= 2146959360:
        raise SketchesArgumentError(f"reservoir k out of encodable range: {k}")
    p = k.bit_length() - 1
    if k == 1 << p:
        return (p & 0x1F) << 11
    import math

    m = math.pow(2.0, math.log2(k) - p)
    i = int(math.floor(m * _RS_BINS_PER_OCTAVE)) - _RS_BINS_PER_OCTAVE + 1
    if i == _RS_BINS_PER_OCTAVE:
        return ((p + 1) & 0x1F) << 11
    return ((p & 0x1F) << 11) | (i & 0x7FF)


def _reservoir_size_decode(enc: int) -> int:
    """ReservoirSize.decodeValue: (1<<p) * (i/2048 + 1)."""
    if enc > _RS_MAX_ENC:
        raise SketchesArgumentError(f"invalid encoded reservoir size: {enc:#x}")
    p = (enc >> 11) & 0x1F
    i = enc & 0x7FF
    return int((1 << p) * (i / _RS_BINS_PER_OCTAVE + 1.0))


def reservoir_longs_from_bytes(raw: bytes) -> ReservoirSketch:
    if len(raw) < 8:
        raise SketchesArgumentError("buffer too small for reservoir preamble")
    pre_longs, ser_ver, fam_id, flags = struct.unpack_from("<4B", raw, 0)
    pre_longs &= 0x3F
    if fam_id != RESERVOIR_FAMILY_ID:
        raise SketchesArgumentError(f"not a reservoir image (family {fam_id})")
    if ser_ver == 1:
        # serVer 1 stored K pseudo-log-encoded in a short at bytes 4-5
        # (ReservoirSize.computeSize: exponent<<11 | 2048-bin mantissa index;
        # ReservoirLongsSketch.java:213-215 decodes via decodeValue)
        (enc,) = struct.unpack_from("<H", raw, 4)
        k = _reservoir_size_decode(enc)
    elif ser_ver == 2:
        (k,) = struct.unpack_from("<i", raw, 4)
    else:
        raise SketchesArgumentError(f"unsupported reservoir SerVer {ser_ver}")
    sk = ReservoirSketch(k)
    if flags & _EMPTY_FLAG or pre_longs == 1:
        return sk
    (n,) = struct.unpack_from("<q", raw, 8)
    num_items = min(k, n)
    items = np.frombuffer(raw, dtype="<i8", count=num_items, offset=16)
    sk.n = int(n)
    sk.samples = items.tolist()
    return sk


# ---------------------------------------------------------------------------
# varopt (longs)

def varopt_longs_to_bytes(sk: VarOptItemsSketch) -> bytes:
    h, r = sk.h, sk.r
    if h == 0 and r == 0:
        out = bytearray(8)
        struct.pack_into("<4B", out, 0, 1, _VAROPT_SER_VER, VAROPT_FAMILY_ID, _EMPTY_FLAG)
        struct.pack_into("<i", out, 4, sk.k)
        return bytes(out)
    pre_longs = 3 if r == 0 else 4
    pairs = sk.samples()  # [(item, weight)] — H region first, then R region
    h_weights = np.array([w for _, w in pairs[:h]], dtype=np.float64)
    items = np.array([it for it, _ in pairs], dtype=np.int64)
    out = bytearray(8 * pre_longs + 8 * h + 8 * len(items))
    struct.pack_into("<4B", out, 0, pre_longs, _VAROPT_SER_VER, VAROPT_FAMILY_ID, 0)
    struct.pack_into("<i", out, 4, sk.k)
    struct.pack_into("<q", out, 8, sk.n)
    struct.pack_into("<2i", out, 16, h, r)
    if r > 0:
        struct.pack_into("<d", out, 24, sk.total_wt_r)
    off = 8 * pre_longs
    out[off : off + 8 * h] = h_weights.astype("<f8").tobytes()
    off += 8 * h
    out[off:] = items.astype("<i8").tobytes()
    return bytes(out)


def varopt_longs_from_bytes(raw: bytes) -> VarOptItemsSketch:
    if len(raw) < 8:
        raise SketchesArgumentError("buffer too small for varopt preamble")
    pre_longs, ser_ver, fam_id, flags = struct.unpack_from("<4B", raw, 0)
    pre_longs &= 0x3F
    if fam_id != VAROPT_FAMILY_ID:
        raise SketchesArgumentError(f"not a varopt image (family {fam_id})")
    if ser_ver != _VAROPT_SER_VER:
        raise SketchesArgumentError(f"unsupported varopt SerVer {ser_ver}")
    if flags & _GADGET_FLAG:
        raise SketchesArgumentError("varopt union-gadget images (mark bytes) not supported")
    (k,) = struct.unpack_from("<i", raw, 4)
    sk = VarOptItemsSketch(k)
    if flags & _EMPTY_FLAG or pre_longs == 1:
        return sk
    (n,) = struct.unpack_from("<q", raw, 8)
    h, r = struct.unpack_from("<2i", raw, 16)
    total_wt_r = struct.unpack_from("<d", raw, 24)[0] if pre_longs == 4 else 0.0
    off = 8 * pre_longs
    h_weights = np.frombuffer(raw, dtype="<f8", count=h, offset=off)
    off += 8 * h
    items = np.frombuffer(raw, dtype="<i8", count=h + r, offset=off)
    sk.n = int(n)
    # rebuild the H heap [(weight, tiebreak, item)] and the R region list
    sk._tie = h
    sk._heap = [(float(w), i, int(it)) for i, (w, it) in enumerate(zip(h_weights, items[:h]))]
    import heapq

    heapq.heapify(sk._heap)
    sk.r_items = [int(x) for x in items[h:]]
    sk.total_wt_r = float(total_wt_r)
    sk.total_weight = float(h_weights.sum()) + float(total_wt_r)
    return sk
