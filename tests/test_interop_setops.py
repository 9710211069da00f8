"""Theta set-operation wire images (Union family 4, Intersection family 5)
and the heapify_sketch family-dispatch facade."""

import struct

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.interop import (
    alpha_to_bytes,
    compute_seed_hash,
    heapify_sketch,
    quickselect_to_bytes,
    theta_intersection_from_bytes,
    theta_intersection_to_bytes,
    theta_to_bytes,
    theta_union_from_bytes,
    theta_union_to_bytes,
)
from raydedup.kmv import MAX_THETA, KmvSketch, build_sketch
from raydedup.sketches.alpha import AlphaSketch


def _kmv(n, k=2048, seed=1):
    rng = np.random.default_rng(seed)
    return build_sketch(
        rng.integers(1, 1 << 63, size=n, dtype=np.int64).astype(np.uint64), k
    )


def test_union_image_layout_and_roundtrip():
    sk = _kmv(10_000)
    raw = theta_union_to_bytes(sk)
    # preLongs=4, SerVer 3, family UNION=4; unionThetaLong at bytes 24-31
    assert raw[0] & 0x3F == 4 and raw[1] == 3 and raw[2] == 4
    assert struct.unpack_from("<H", raw, 6)[0] == compute_seed_hash(9001)
    gadget_theta = np.frombuffer(raw, dtype="<u8", count=1, offset=16)[0]
    union_theta = np.frombuffer(raw, dtype="<u8", count=1, offset=24)[0]
    assert gadget_theta == union_theta == sk.theta
    back = theta_union_from_bytes(raw)
    assert back.theta == sk.theta
    assert back.hashes.tolist() == sk.hashes.tolist()


def test_union_min_theta_rule_on_read():
    sk = _kmv(10_000)
    raw = bytearray(theta_union_to_bytes(sk))
    # lower the union theta below the gadget theta: reader must clamp
    lower = int(sk.theta) // 2
    raw[24:32] = np.array([lower], dtype="<u8").tobytes()
    back = theta_union_from_bytes(bytes(raw))
    assert back.theta == lower
    assert (back.hashes < np.uint64(lower)).all()
    assert len(back.hashes) == int((sk.hashes < np.uint64(lower)).sum())


def test_union_empty_roundtrip():
    empty = KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=64)
    back = theta_union_from_bytes(theta_union_to_bytes(empty))
    assert len(back.hashes) == 0 and back.theta == MAX_THETA


def test_intersection_image_layout_and_roundtrip():
    sk = _kmv(5_000, k=1024, seed=3)
    raw = theta_intersection_to_bytes(sk)
    assert raw[0] & 0x3F == 3 and raw[1] == 3 and raw[2] == 5
    (count,) = struct.unpack_from("<i", raw, 8)
    assert count == len(sk.hashes)
    back = theta_intersection_from_bytes(raw)
    assert back.theta == sk.theta
    assert back.hashes.tolist() == sk.hashes.tolist()


def test_intersection_empty_has_no_table():
    empty = KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=64)
    raw = theta_intersection_to_bytes(empty)
    assert len(raw) == 24  # 3 preamble longs only (IntersectionImpl:357)
    back = theta_intersection_from_bytes(raw)
    assert len(back.hashes) == 0


def test_intersection_virgin_rejected():
    empty = KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=64)
    raw = bytearray(theta_intersection_to_bytes(empty))
    raw[5] = 0  # clear EMPTY flag
    raw[8:12] = struct.pack("<i", -1)  # curCount = -1: virgin state
    with pytest.raises(SketchesArgumentError):
        theta_intersection_from_bytes(bytes(raw))


def test_setop_rejects_family_confusion():
    sk = _kmv(1_000)
    with pytest.raises(SketchesArgumentError):
        theta_union_from_bytes(theta_intersection_to_bytes(sk))
    with pytest.raises(SketchesArgumentError):
        theta_intersection_from_bytes(theta_union_to_bytes(sk))


def test_heapify_sketch_dispatches_all_theta_families():
    kmv = _kmv(8_000, seed=5)
    alpha = AlphaSketch(lg_k=9)
    alpha.update_hashes(
        np.random.default_rng(6).integers(1, 1 << 63, 20_000, dtype=np.int64).astype(np.uint64)
    )
    cases = [
        (alpha_to_bytes(alpha), AlphaSketch),
        (quickselect_to_bytes(kmv), KmvSketch),
        (theta_to_bytes(kmv), KmvSketch),
        (theta_union_to_bytes(kmv), KmvSketch),
        (theta_intersection_to_bytes(kmv), KmvSketch),
    ]
    for raw, want in cases:
        out = heapify_sketch(raw)
        assert isinstance(out, want), raw[2]
    # estimates agree across the compact-returning families
    ests = {heapify_sketch(raw).estimate() for raw, want in cases[1:]}
    assert ests == {kmv.estimate()}
    with pytest.raises(SketchesArgumentError):
        heapify_sketch(b"\x01\x03\x63" + b"\x00" * 21)  # family 99
