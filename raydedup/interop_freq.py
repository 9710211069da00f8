"""Frequencies wire-format interop (SerVer-1 images, family 10).

Implements the reference frequent-items layout (``frequencies/
PreambleUtil.java:50-92``, ``LongsSketch.java:565-607``): preamble longs
1 (empty) / 4 — byte 0 preLongs, byte 1 serVer (1), byte 2 family (10),
byte 3 lgMaxMapSize, byte 4 lgCurMapSize, byte 5 flags (EMPTY=4);
activeItems:i32 at 8, streamLength:i64 at 16, offset:i64 at 24 — then the
VALUES buffer (longs) followed by the KEYS buffer (longs for the longs
sketch; ``ArrayOfStringsSerDe`` records ``(len:i32, utf8)`` for the items
sketch, ``ItemsSketch.java:498-540``).

Semantics note: the reference hash map stores LOWER-bound counts and
``getEstimate = value + offset`` (``LongsSketch.java:378-383``); the
engine's ``FrequentKeysSketch`` bakes the offset into its stored values
(upper bounds). The codec converts both ways, so estimates, bounds and
``get_frequent_items`` results survive the wire unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

from .config import SketchesArgumentError
from .sketches.freq import FrequentItemsSketch, FrequentKeysSketch

FREQ_FAMILY_ID = 10
_FREQ_SER_VER = 1
_EMPTY_FLAG = 4
_MIN_LG_MAP = 3  # ReversePurgeLongHashMap minimum map size 8


def _lg_ceil(x: int) -> int:
    return max(int(x) - 1, 0).bit_length()


def _cur_lg(active: int) -> int:
    # smallest map whose 0.75 load factor holds `active` entries
    lg = _MIN_LG_MAP
    while active > (3 << lg) >> 2:
        lg += 1
    return lg


def _preamble(sk: FrequentKeysSketch, active: int) -> bytearray:
    if active == 0:
        out = bytearray(8)
        struct.pack_into(
            "<6B", out, 0, 1, _FREQ_SER_VER, FREQ_FAMILY_ID,
            max(_lg_ceil(sk.max_map_size), _MIN_LG_MAP), _MIN_LG_MAP, _EMPTY_FLAG,
        )
        return out
    out = bytearray(32)
    struct.pack_into(
        "<6B", out, 0, 4, _FREQ_SER_VER, FREQ_FAMILY_ID,
        max(_lg_ceil(sk.max_map_size), _MIN_LG_MAP), _cur_lg(active), 0,
    )
    struct.pack_into("<i", out, 8, active)
    struct.pack_into("<q", out, 16, sk.stream_len)
    struct.pack_into("<q", out, 24, sk.offset)
    return out


def _lower_bound_values(sk: FrequentKeysSketch) -> np.ndarray:
    # engine values are upper bounds; the wire stores lower bounds
    return (
        np.fromiter(sk.counts.values(), dtype=np.int64, count=len(sk.counts))
        - np.int64(sk.offset)
    )


def _read_preamble(raw: bytes) -> tuple[int, int, int, int, int, int]:
    """Returns (active, lg_max, stream_len, offset, payload_off, empty)."""
    if len(raw) < 8:
        raise SketchesArgumentError("buffer too small for frequencies preamble")
    pre_longs, ser_ver, fam_id, lg_max, _lg_cur, flags = struct.unpack_from("<6B", raw, 0)
    if fam_id != FREQ_FAMILY_ID:
        raise SketchesArgumentError(f"not a frequencies image (family {fam_id})")
    if ser_ver != _FREQ_SER_VER:
        raise SketchesArgumentError(f"unsupported frequencies SerVer {ser_ver}")
    if pre_longs not in (1, 4):
        raise SketchesArgumentError(f"bad frequencies preLongs {pre_longs}")
    if flags & _EMPTY_FLAG or pre_longs == 1:
        return 0, lg_max, 0, 0, 8, 1
    (active,) = struct.unpack_from("<i", raw, 8)
    (stream_len,) = struct.unpack_from("<q", raw, 16)
    (offset,) = struct.unpack_from("<q", raw, 24)
    if len(raw) < 32 + 8 * active:
        raise SketchesArgumentError("frequencies image truncated")
    return active, lg_max, stream_len, offset, 32, 0


# ---------------------------------------------------------------------------
# longs sketch

def freq_longs_to_bytes(sk: FrequentKeysSketch) -> bytes:
    active = len(sk.counts)
    out = _preamble(sk, active)
    if active == 0:
        return bytes(out)
    keys = np.fromiter(sk.counts.keys(), dtype=np.int64, count=active)
    return bytes(out) + _lower_bound_values(sk).astype("<i8").tobytes() + keys.astype(
        "<i8"
    ).tobytes()


def freq_longs_from_bytes(raw: bytes) -> FrequentKeysSketch:
    active, lg_max, stream_len, offset, off, empty = _read_preamble(raw)
    sk = FrequentKeysSketch(1 << lg_max)
    if empty:
        return sk
    vals = np.frombuffer(raw, dtype="<i8", count=active, offset=off)
    keys = np.frombuffer(raw, dtype="<i8", count=active, offset=off + 8 * active)
    sk.offset = int(offset)
    sk.stream_len = int(stream_len)
    sk.counts = dict(zip(keys.tolist(), (vals + np.int64(offset)).tolist()))
    return sk


# ---------------------------------------------------------------------------
# items sketch (string payload, ArrayOfStringsSerDe)

def freq_string_items_to_bytes(sk: FrequentItemsSketch) -> bytes:
    active = len(sk.counts)
    out = bytes(_preamble(sk, active))
    if active == 0:
        return out
    payload = bytearray()
    for key in sk.counts.keys():
        b = str(key).encode("utf-8")
        payload += struct.pack("<i", len(b)) + b
    return out + _lower_bound_values(sk).astype("<i8").tobytes() + bytes(payload)


def freq_string_items_from_bytes(raw: bytes) -> FrequentItemsSketch:
    active, lg_max, stream_len, offset, off, empty = _read_preamble(raw)
    sk = FrequentItemsSketch(1 << lg_max)
    if empty:
        return sk
    vals = np.frombuffer(raw, dtype="<i8", count=active, offset=off)
    pos = off + 8 * active
    counts: dict = {}
    for i in range(active):
        if pos + 4 > len(raw):
            raise SketchesArgumentError("frequencies items payload truncated")
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        if ln < 0 or pos + ln > len(raw):
            raise SketchesArgumentError("frequencies items payload truncated")
        counts[raw[pos : pos + ln].decode("utf-8")] = int(vals[i]) + int(offset)
        pos += ln
    sk.offset = int(offset)
    sk.stream_len = int(stream_len)
    sk.counts = counts
    return sk
