"""Cross-ecosystem wire format for generic-item KLL sketches (string items).

The reference checkout serializes only float/double KLL
(kll/KllPreambleUtil.java:130-160); its generic quantiles family
(quantiles/ItemsSketch.java) shows the items analog: the SAME preamble and
level structure with the fixed-width item arrays replaced by
ArrayOfItemsSerDe payloads. This module applies exactly that substitution
to the KLL compact layout, using the reference's UTF-8 string serde
(common/ArrayOfStringsSerDe.java:40-74: per item an int32 byte length
followed by the UTF-8 bytes, native little-endian like every multi-byte
primitive in the library):

  byte 0: preamble ints, 1: SerVer, 2: FamID=15, 3: flags, 4-5: k, 6: m,
  7: unused.
  Empty (SerVer 1): preamble only.
  Single item (SerVer 2, SINGLE flag): the serialized item at offset 8.
  Full compact (SerVer 1): 8-15 n, 16-17 minK, 18 numLevels, 19 unused,
  levels fences (numLevels int32, top fence implied by
  computeTotalItemCapacity like the float form — KllMemoryValidate.java:
  131-134), then serialized min item, max item, then the retained items
  level 0 first. Level 0 is written sorted and the L0_SORTED flag set,
  matching the reference's compact-image convention.

Item type is implied by the caller's serde, as in the reference (heapify
takes the serde); only the string serde is implemented here.
"""

from __future__ import annotations

import struct

import numpy as np

from .interop import (
    _FAMILY_KLL,
    _KLL_EMPTY_FLAG,
    _KLL_L0_SORTED_FLAG,
    _KLL_M,
    _KLL_SINGLE_FLAG,
    SketchesArgumentError,
    _ref_level_capacity,
    _ref_total_capacity,
)
from .sketches.kll_items import KllItemsSketch


def _write_items(items) -> bytes:
    """ArrayOfStringsSerDe.serializeToByteArray (common/ArrayOfStringsSerDe
    .java:40-57): per item int32 UTF-8 byte length + the bytes."""
    out = bytearray()
    for s in items:
        if not isinstance(s, str):
            raise SketchesArgumentError(
                f"string serde requires str items, got {type(s).__name__}"
            )
        b = s.encode("utf-8")
        out += struct.pack("<i", len(b))
        out += b
    return bytes(out)


def _read_items(raw: bytes, off: int, count: int) -> tuple[list[str], int]:
    """ArrayOfStringsSerDe.deserializeFromMemory (common/ArrayOfStringsSerDe
    .java:59-74)."""
    items: list[str] = []
    for _ in range(count):
        if off + 4 > len(raw):
            raise SketchesArgumentError("truncated string item length")
        (ln,) = struct.unpack_from("<i", raw, off)
        off += 4
        if ln < 0 or off + ln > len(raw):
            raise SketchesArgumentError("truncated string item payload")
        items.append(raw[off : off + ln].decode("utf-8"))
        off += ln
    return items, off


def kll_items_to_reference_bytes(sk: KllItemsSketch) -> bytes:
    """Serialize the engine's KllItemsSketch to the compact items image.

    Like the float writer (interop.kll_to_reference_bytes), the engine's
    ceil capacity rule can retain a hair more than the reference's
    round-half-up capacity for the same numLevels, so weight-preserving
    compactions run until the retained set fits under the implied fence.
    """
    k = sk.k
    if sk.n == 0:
        return struct.pack(
            "<BBBBHBB", 2, 1, _FAMILY_KLL, _KLL_EMPTY_FLAG, k, _KLL_M, 0
        )
    if sk.n == 1:
        item = next(lvl[0] for lvl in sk.levels if len(lvl))
        return (
            struct.pack(
                "<BBBBHBB", 2, 2, _FAMILY_KLL,
                _KLL_SINGLE_FLAG | _KLL_L0_SORTED_FLAG, k, _KLL_M, 0,
            )
            + _write_items([item])
        )
    levels = [lvl.copy() for lvl in sk.levels]
    while len(levels) > 1 and len(levels[-1]) == 0:
        levels.pop()
    while sum(map(len, levels)) > _ref_total_capacity(k, len(levels)):
        for i, lvl in enumerate(levels):
            if len(lvl) >= 2 and len(lvl) >= _ref_level_capacity(k, len(levels), i):
                srt = np.sort(lvl)
                leftover = srt[: len(srt) % 2]
                promoted = srt[len(srt) % 2 :][::2]
                if i + 1 == len(levels):
                    levels.append(np.zeros(0, dtype=object))
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
                levels[i] = leftover
                break
        else:
            break
    levels[0] = np.sort(levels[0])  # compact images carry a sorted level 0
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
    retained = [x for lvl in levels for x in lvl]
    return b"".join(
        [
            struct.pack(
                "<BBBBHBB", 5, 1, _FAMILY_KLL, _KLL_L0_SORTED_FLAG, k, _KLL_M, 0
            ),
            struct.pack("<qHBB", sk.n, k, num_levels, 0),
            np.ascontiguousarray(fences[:num_levels], dtype="<i4").tobytes(),
            _write_items([sk._min, sk._max]),
            _write_items(retained),
        ]
    )


def kll_items_from_reference_bytes(raw: bytes) -> KllItemsSketch:
    """Heapify a compact items image (string serde) into KllItemsSketch."""
    if len(raw) < 8:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 8")
    _pre_ints, ser_ver, family, flags, k, m, _ = struct.unpack_from("<BBBBHBB", raw, 0)
    if family != _FAMILY_KLL:
        raise SketchesArgumentError(f"not a KLL image (family {family})")
    sk = KllItemsSketch(k)
    if flags & _KLL_EMPTY_FLAG:
        return sk
    if (flags & _KLL_SINGLE_FLAG) or ser_ver == 2:
        items, _ = _read_items(raw, 8, 1)
        sk.update(items[0])
        return sk
    n, _min_k, num_levels = struct.unpack_from("<qHB", raw, 8)
    fences = list(
        np.frombuffer(raw, dtype="<i4", count=num_levels, offset=20).astype(np.int64)
    ) + [_ref_total_capacity(k, num_levels, m)]
    off = 20 + num_levels * 4
    (mn, mx), off = _read_items(raw, off, 2)
    retained, _ = _read_items(raw, off, int(fences[-1] - fences[0]))
    base = int(fences[0])
    for lvl in range(num_levels):
        chunk = retained[fences[lvl] - base : fences[lvl + 1] - base]
        if not chunk:
            continue
        while lvl >= len(sk.levels):
            sk.levels.append(np.zeros(0, dtype=object))
        arr = np.empty(len(chunk), dtype=object)
        for i, x in enumerate(chunk):
            arr[i] = x
        sk.levels[lvl] = np.concatenate([sk.levels[lvl], arr])
    sk.n = int(n)
    sk._min = mn
    sk._max = mx
    return sk
