"""ArrayOfStrings tuple wire interop (raydedup/interop_aos.py) vs the
reference tuple/strings/* layout (family 9, generic tuple CompactSketch)."""

import struct

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.fdt import FdtSketch
from raydedup.hashing import murmur3_128_bytes, xxh64_bytes
from raydedup.interop import compute_seed_hash
from raydedup.interop_aos import (
    aos_tuple_from_bytes,
    aos_tuple_to_bytes,
    string_arr_key,
)
from raydedup.kmv import MAX_THETA
from raydedup.sketches.tuple import ArrayOfStringsSketch


def _mk(tuples):
    sk = ArrayOfStringsSketch(1 << 12)
    for arr in tuples:
        sk.update_many(
            np.array([string_arr_key(arr)], dtype=np.uint64),
            ["\x00".join(arr)],
        )
    return sk


def test_string_arr_key_matches_documented_chain():
    # stage 1: XxHash.hashCharArr over UTF-16-LE chars of ",".join(arr),
    # seed 0x7A3CCA71 (tuple/Util.java:133-136); stage 2: murmur3-128 of the
    # 8 LE bytes with seed 9001, >>> 1 (tuple/QuickSelectSketch.java:157-160)
    arr = ["a", "b"]
    h1 = xxh64_bytes("a,b".encode("utf-16-le"), 0x7A3C_CA71)
    k1, _ = murmur3_128_bytes(struct.pack("<Q", h1), 9001)
    assert string_arr_key(arr) == k1 >> 1
    assert string_arr_key(arr) < 1 << 63
    # concat uses "," separators only BETWEEN elements (Util.stringConcat)
    assert string_arr_key(["a,b"]) == string_arr_key(["a", "b"])


def test_empty_image_is_8_byte_preamble():
    raw = aos_tuple_to_bytes(ArrayOfStringsSketch(64))
    assert len(raw) == 8
    pre_longs, ser_ver, family, sktype, _, flags = struct.unpack_from("<BBBBBB", raw, 0)
    assert (pre_longs, ser_ver, family, sktype) == (1, 3, 9, 1)
    assert flags & 4  # IS_EMPTY
    assert struct.unpack_from("<H", raw, 6)[0] == compute_seed_hash(9001)
    back = aos_tuple_from_bytes(raw, k=64)
    assert len(back.hashes) == 0 and back.theta == MAX_THETA


def test_single_item_image_uses_one_preamble_long():
    sk = _mk([["x", "y"]])
    raw = aos_tuple_to_bytes(sk)
    assert raw[0] == 1  # preLongs
    # record = hash(8) + totBytes(4) + numNodes(1) + 2*(len(4)+1)
    assert len(raw) == 8 + 8 + 4 + 1 + (4 + 1) * 2
    back = aos_tuple_from_bytes(raw)
    assert back.hashes.tolist() == sk.hashes.tolist()
    assert back.summaries == sk.summaries


@pytest.mark.parametrize("n", [2, 5, 40])
def test_roundtrip_exact_mode(n):
    tuples = [[f"u{i}", f"p{i % 3}", f"r{i % 7}"] for i in range(n)]
    sk = _mk(tuples)
    raw = aos_tuple_to_bytes(sk)
    back = aos_tuple_from_bytes(raw, k=sk.k)
    assert back.hashes.tolist() == sk.hashes.tolist()
    assert back.summaries == sk.summaries
    assert back.theta == sk.theta


def test_roundtrip_estimating_mode_writes_theta():
    sk = ArrayOfStringsSketch(16)
    for i in range(200):
        arr = [f"k{i}", f"v{i}"]
        sk.update_many(
            np.array([string_arr_key(arr)], dtype=np.uint64), ["\x00".join(arr)]
        )
    assert sk.theta != MAX_THETA
    raw = aos_tuple_to_bytes(sk)
    assert raw[0] == 3  # preLongs: header + count + theta
    back = aos_tuple_from_bytes(raw, k=16)
    assert back.theta == sk.theta
    assert back.hashes.tolist() == sk.hashes.tolist()
    assert abs(back.estimate() - sk.estimate()) < 1e-9


def test_summary_record_layout_matches_reference():
    # ArrayOfStringsSummary.toByteArray: totBytes:i32, numNodes:u8,
    # then per node len:i32 + utf8 (ArrayOfStringsSummary.java:74-88)
    sk = _mk([["ab", "cdé"]])
    raw = aos_tuple_to_bytes(sk)
    off = 8 + 8  # preamble + hash
    tot, nn = struct.unpack_from("<iB", raw, off)
    assert nn == 2
    (l0,) = struct.unpack_from("<i", raw, off + 5)
    assert raw[off + 9 : off + 9 + l0] == b"ab"
    (l1,) = struct.unpack_from("<i", raw, off + 9 + l0)
    assert raw[off + 13 + l0 : off + 13 + l0 + l1] == "cdé".encode()
    assert tot == 5 + 4 + l0 + 4 + l1
    assert off + tot == len(raw)


def test_rejects_wrong_family_seed_and_truncation():
    sk = _mk([["a", "b"], ["c", "d"]])
    raw = bytearray(aos_tuple_to_bytes(sk))
    bad = bytes(raw[:2]) + b"\x03" + bytes(raw[3:])  # family 3 (theta)
    with pytest.raises(SketchesArgumentError):
        aos_tuple_from_bytes(bad)
    with pytest.raises(SketchesArgumentError):
        aos_tuple_from_bytes(bytes(raw), seed=12345)
    with pytest.raises(SketchesArgumentError):
        aos_tuple_from_bytes(bytes(raw[:-3]))


def test_multi_array_summary_has_no_wire_form():
    sk = ArrayOfStringsSketch(64)
    h = np.array([string_arr_key(["a"])], dtype=np.uint64)
    sk.update_many(h, ["a"])
    sk.update_many(h, ["b"])  # engine extension: summary set grows
    with pytest.raises(SketchesArgumentError):
        aos_tuple_to_bytes(sk)


def test_fdt_sketch_wire_roundtrip_preserves_result():
    fdt = FdtSketch(lg_k=12)
    for i in range(300):
        fdt.update([f"user{i % 10}", f"item{i}"])
    back = FdtSketch.from_bytes(fdt.to_bytes(), lg_k=12)
    assert back.estimate() == fdt.estimate()
    assert back.get_result([0], limit=5) == fdt.get_result([0], limit=5)
