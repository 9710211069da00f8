"""ArrayOfStrings tuple wire interop (generic tuple family 9, SerVer 3).

The reference's ``tuple/strings/ArrayOfStringsSketch.java`` serializes with
the GENERIC tuple CompactSketch layout (``tuple/CompactSketch.java``
toByteArray: 8-byte header, optional count/theta by preamble longs, then
interleaved ``(hash:long, summary bytes)`` records) where each summary is an
``ArrayOfStringsSummary`` (``tuple/strings/ArrayOfStringsSummary.java:74-88``):
``totBytes:i32, numNodes:u8, [len:i32, utf8]*numNodes``.

Key domain parity (what makes images truly cross-ecosystem): the reference
key for a string array is a two-stage hash chain —

* ``Util.stringArrHash`` (``tuple/Util.java:133-136``): datasketches-memory
  ``XxHash.hashCharArr`` (standard XXH64 over the char array's memory, i.e.
  the UTF-16-LE bytes of ``",".join(arr)``) with seed ``PRIME = 0x7A3C_CA71``
  (``Util.java:37``);
* ``UpdatableSketch.update(long key)`` → ``QuickSelectSketch.update(long[])``
  (``QuickSelectSketch.java:157-160``): murmur3-128 over that long (8 LE
  bytes) with ``ThetaUtil.DEFAULT_UPDATE_SEED`` (hardcoded 9001 — tuple
  updates never use a custom seed), take ``h[0] >>> 1``.

``string_arr_key`` reproduces the chain bit-exactly on top of the engine's
KAT-verified xxh64 and murmur3 kernels, so keys in images written here equal
what a reference consumer would compute for the same tuples.

Summary-order note: the reference summary is an ORDERED String[] and its
union keeps the first-seen array (``ArrayOfStringsSummary.union``), so each
retained key carries exactly one node array. The engine's
``ArrayOfStringsSketch`` stores one packed ``"\\x00"``-joined string per
observed array; the codec maps packed-string ↔ node-array losslessly and
refuses multi-array summaries (an engine extension with no wire form).
"""

from __future__ import annotations

import struct

import numpy as np

from .config import SketchesArgumentError
from .hashing import murmur3_128_bytes, xxh64_bytes
from .interop import DEFAULT_UPDATE_SEED, compute_seed_hash
from .kmv import MAX_THETA
from .sketches.tuple import ArrayOfStringsSketch

_AOS_PRIME = 0x7A3C_CA71  # tuple/Util.java:37
_FAMILY_TUPLE = 9
_SKTYPE_COMPACT = 1  # SerializerDeserializer.SketchType.CompactSketch
_EMPTY_FLAG = 4
_V3_FLAGS = 2 | 8 | 16  # READ_ONLY | COMPACT | ORDERED


def string_arr_key(arr: list[str]) -> int:
    """The reference's theta-domain key for a string tuple (63-bit)."""
    s = ",".join(arr)
    h1 = xxh64_bytes(s.encode("utf-16-le"), _AOS_PRIME)
    k1, _ = murmur3_128_bytes(struct.pack("<Q", h1), DEFAULT_UPDATE_SEED)
    return k1 >> 1


def _summary_to_bytes(nodes: tuple[str, ...]) -> bytes:
    if not 1 <= len(nodes) <= 127:
        raise SketchesArgumentError(f"numNodes {len(nodes)} outside [1, 127]")
    blobs = [n.encode("utf-8") for n in nodes]
    tot = 4 + 1 + sum(4 + len(b) for b in blobs)
    out = bytearray(struct.pack("<iB", tot, len(nodes)))
    for b in blobs:
        out += struct.pack("<i", len(b)) + b
    return bytes(out)


def _summary_from_bytes(raw: bytes, off: int) -> tuple[tuple[str, ...], int]:
    if off + 5 > len(raw):
        raise SketchesArgumentError("ArrayOfStrings summary truncated")
    tot, n_nodes = struct.unpack_from("<iB", raw, off)
    end = off + tot
    if tot < 5 or end > len(raw):
        raise SketchesArgumentError("ArrayOfStrings summary truncated")
    pos = off + 5
    nodes = []
    for _ in range(n_nodes):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        if ln < 0 or pos + ln > end:
            raise SketchesArgumentError("ArrayOfStrings summary truncated")
        nodes.append(raw[pos : pos + ln].decode("utf-8"))
        pos += ln
    if pos != end:
        raise SketchesArgumentError("ArrayOfStrings summary length mismatch")
    return tuple(nodes), end


def _packed_to_nodes(summary: frozenset) -> tuple[str, ...]:
    if len(summary) != 1:
        raise SketchesArgumentError(
            "wire ArrayOfStrings summaries hold exactly one node array per key; "
            f"engine summary has {len(summary)}"
        )
    return tuple(next(iter(summary)).split("\x00"))


def aos_tuple_to_bytes(sk: ArrayOfStringsSketch,
                       seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize to the reference ArrayOfStringsSketch compact image."""
    n = len(sk.hashes)
    seed_hash = compute_seed_hash(seed)
    estimating = sk.theta != MAX_THETA
    if n == 0 and not estimating:
        return struct.pack(
            "<BBBBBBH", 1, 3, _FAMILY_TUPLE, _SKTYPE_COMPACT, 0,
            _V3_FLAGS | _EMPTY_FLAG, seed_hash,
        )
    pre_longs = 3 if estimating else (1 if n == 1 else 2)
    out = bytearray(
        struct.pack(
            "<BBBBBBH", pre_longs, 3, _FAMILY_TUPLE, _SKTYPE_COMPACT, 0,
            _V3_FLAGS, seed_hash,
        )
    )
    if pre_longs >= 2:
        out += struct.pack("<iI", n, 0)
    if pre_longs == 3:
        out += np.array([sk.theta], dtype="<u8").tobytes()
    for h, summ in zip(sk.hashes.tolist(), sk.summaries):
        out += struct.pack("<Q", h) + _summary_to_bytes(_packed_to_nodes(summ))
    return bytes(out)


def aos_tuple_from_bytes(raw: bytes, k: int | None = None,
                         seed: int = DEFAULT_UPDATE_SEED) -> ArrayOfStringsSketch:
    """Heapify a reference ArrayOfStringsSketch image (SerVer 3 interleaved,
    or SerVer 1/2 legacy blocked layout)."""
    if len(raw) < 8:
        raise SketchesArgumentError(f"source too small: {len(raw)} < 8")
    pre_longs, ser_ver, family, sktype = struct.unpack_from("<BBBB", raw, 0)
    if family != _FAMILY_TUPLE:
        raise SketchesArgumentError(f"not a tuple image (family {family})")
    if sktype != _SKTYPE_COMPACT:
        raise SketchesArgumentError(f"not a tuple CompactSketch (type {sktype})")
    if ser_ver > 3:
        raise SketchesArgumentError(f"unsupported tuple SerVer: {ser_ver}")

    theta = MAX_THETA
    hashes: list[int] = []
    nodes_per_key: list[tuple[str, ...]] = []

    if ser_ver <= 2:  # legacy: hashes block then summaries block
        flags = raw[4]
        if flags & 1:
            raise SketchesArgumentError("big-endian images not supported")
        off = 5
        if flags & 8:  # IS_THETA_INCLUDED
            theta = np.frombuffer(raw, dtype="<u8", count=1, offset=off)[0]
            off += 8
        if flags & 4:  # HAS_ENTRIES
            if ser_ver == 1:
                name_len = raw[off]
                off += 1
            (count,) = struct.unpack_from("<i", raw, off)
            off += 4
            if ser_ver == 1:
                off += name_len
            hashes = np.frombuffer(
                raw, dtype="<u8", count=count, offset=off
            ).tolist()
            off += 8 * count
            for _ in range(count):
                nodes, off = _summary_from_bytes(raw, off)
                nodes_per_key.append(nodes)
    else:  # v3 interleaved
        flags = raw[5]
        seed_hash = struct.unpack_from("<H", raw, 6)[0]
        if seed_hash != 0 and seed_hash != compute_seed_hash(seed):
            raise SketchesArgumentError(
                f"seed hash mismatch: image {seed_hash} vs seed {seed}"
            )
        if flags & _EMPTY_FLAG:
            count, off = 0, 8
        elif pre_longs == 1:
            count, off = 1, 8
        elif pre_longs in (2, 3):
            (count,) = struct.unpack_from("<i", raw, 8)
            off = 16
            if pre_longs == 3:
                theta = np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0]
                off = 24
        else:
            raise SketchesArgumentError(f"bad tuple preamble longs: {pre_longs}")
        for _ in range(count):
            if off + 8 > len(raw):
                raise SketchesArgumentError("tuple image truncated")
            (h,) = struct.unpack_from("<Q", raw, off)
            nodes, off = _summary_from_bytes(raw, off + 8)
            hashes.append(h)
            nodes_per_key.append(nodes)

    out = ArrayOfStringsSketch(k or max(len(hashes), 1))
    out.theta = np.uint64(theta)
    harr = np.array(hashes, dtype=np.uint64)
    order = np.argsort(harr, kind="stable")
    out.hashes = harr[order]
    out.summaries = [
        frozenset({"\x00".join(nodes_per_key[i])}) for i in order
    ]
    return out
