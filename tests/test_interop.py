"""Cross-ecosystem wire-format conformance (raydedup.interop).

Theta: round-trips through the reference's SerVer-3 compact-ordered image
(theta/PreambleUtil.java:54-110) plus the hard-coded cross-language seed
hash constant (tuple/CompactSketch.java:46 documents 37836 for seed 9001).

KLL: reads the reference's float/double images (kll/KllPreambleUtil.java),
verified against the upstream golden resource
``kll_sketch_float_one_item_v1.sk``, and writes reference-layout float
images (top fence implied by computeTotalItemCapacity).
"""

import struct
from pathlib import Path

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.interop import (
    _ref_level_capacity,
    _ref_total_capacity,
    compute_seed_hash,
    kll_from_reference_bytes,
    kll_to_reference_bytes,
    theta_from_bytes,
    theta_to_bytes,
)
from raydedup.kmv import MAX_THETA, KmvSketch, build_sketch, empty_sketch, union
from raydedup.sketches.kll import KllSketch

RESOURCES = Path("/root/reference/src/test/resources")


# ---------------------------------------------------------------------------
# seed hash
# ---------------------------------------------------------------------------


def test_seed_hash_matches_reference_constant():
    # The reference hard-codes 37836 as computeSeedHash(9001) — the same
    # value all language bindings must produce (tuple/CompactSketch.java:46).
    assert compute_seed_hash(9001) == 37836


def test_seed_hash_nonzero_rule():
    # any seed works unless its hash is 0; just verify range + determinism
    h = compute_seed_hash(12345)
    assert 0 < h < 65536
    assert compute_seed_hash(12345) == h


# ---------------------------------------------------------------------------
# theta images
# ---------------------------------------------------------------------------


def test_theta_empty_image_is_8_bytes():
    raw = theta_to_bytes(empty_sketch(16))
    assert len(raw) == 8
    pre, ser, fam, _, _, flags, seed_hash = struct.unpack("<BBBBBBH", raw)
    assert (pre, ser, fam) == (1, 3, 3)
    assert flags & 4  # EMPTY
    assert seed_hash == 37836
    back = theta_from_bytes(raw)
    assert len(back.hashes) == 0 and back.theta == MAX_THETA


def test_theta_single_item_image_is_16_bytes():
    sk = build_sketch(np.array([12345], dtype=np.uint64), k=16)
    raw = theta_to_bytes(sk)
    assert len(raw) == 16
    flags = raw[5]
    assert flags & 32  # SINGLEITEM
    back = theta_from_bytes(raw)
    assert back.theta == MAX_THETA
    assert list(back.hashes) == [12345]


def test_theta_exact_mode_round_trip():
    hashes = np.sort(np.array([7, 99, 1234, 2**62], dtype=np.uint64))
    sk = build_sketch(hashes, k=16)
    raw = theta_to_bytes(sk)
    # preLongs=2: 16-byte preamble (no theta long) + 4 hash longs
    assert len(raw) == 16 + 8 * 4
    assert raw[0] == 2
    back = theta_from_bytes(raw, k=16)
    assert back.theta == MAX_THETA
    np.testing.assert_array_equal(back.hashes, sk.hashes)
    assert back.estimate() == sk.estimate()


def test_theta_estimating_mode_round_trip():
    rng = np.random.default_rng(7)
    vals = rng.integers(1, 2**63, size=5000, dtype=np.uint64)
    sk = build_sketch(vals, k=256)
    assert sk.is_estimation_mode
    raw = theta_to_bytes(sk)
    assert raw[0] == 3  # preLongs=3 carries theta
    back = theta_from_bytes(raw, k=256)
    assert back.theta == sk.theta
    np.testing.assert_array_equal(back.hashes, sk.hashes)
    assert back.estimate() == pytest.approx(sk.estimate())
    # deserialized sketches stay algebraically usable
    u = union(back, sk, k=256)
    assert u.estimate() == pytest.approx(sk.estimate())


def test_theta_unordered_image_sorted_on_read():
    sk = build_sketch(np.array([50, 10, 30], dtype=np.uint64), k=8)
    raw = bytearray(theta_to_bytes(sk))
    # clear ORDERED flag and scramble the hash longs
    raw[5] &= ~16 & 0xFF
    scrambled = np.array([30, 50, 10], dtype="<u8").tobytes()
    raw[16:] = scrambled
    back = theta_from_bytes(bytes(raw))
    np.testing.assert_array_equal(back.hashes, np.array([10, 30, 50], dtype=np.uint64))


def test_theta_seed_hash_mismatch_rejected():
    raw = theta_to_bytes(empty_sketch(16), seed=9001)
    with pytest.raises(SketchesArgumentError, match="seed hash"):
        theta_from_bytes(raw, seed=777)


def test_theta_bad_images_rejected():
    with pytest.raises(SketchesArgumentError, match="too small"):
        theta_from_bytes(b"\x01\x03\x03")
    raw = bytearray(theta_to_bytes(empty_sketch(16)))
    raw[1] = 9  # SerVer
    with pytest.raises(SketchesArgumentError, match="SerVer"):
        theta_from_bytes(bytes(raw))
    raw = bytearray(theta_to_bytes(empty_sketch(16)))
    raw[2] = 1  # family
    with pytest.raises(SketchesArgumentError, match="family"):
        theta_from_bytes(bytes(raw))


# ---------------------------------------------------------------------------
# KLL reference capacity formula
# ---------------------------------------------------------------------------


def test_ref_level_capacity_values():
    # KllHelper.levelCapacity: round-half-up k*(2/3)^depth, floor m=8.
    assert _ref_level_capacity(200, 1, 0) == 200
    assert _ref_level_capacity(200, 2, 0) == 133  # round(133.33)
    assert _ref_level_capacity(200, 2, 1) == 200
    assert _ref_level_capacity(200, 3, 0) == 89  # round(88.88..) half-up int math
    assert _ref_level_capacity(200, 61, 0) == 8  # floored at m
    # deep fold path (depth > 30) stays at the m floor for practical k
    assert _ref_level_capacity(200, 40, 0) == 8


# ---------------------------------------------------------------------------
# KLL images
# ---------------------------------------------------------------------------


def test_kll_golden_one_item_v1():
    raw = (RESOURCES / "kll_sketch_float_one_item_v1.sk").read_bytes()
    sk = kll_from_reference_bytes(raw)
    assert sk.k == 200
    assert sk.n == 1
    assert sk._min == 1.0 and sk._max == 1.0
    assert sk.quantile(0.5) == 1.0


def test_kll_empty_round_trip():
    sk = KllSketch(200)
    raw = kll_to_reference_bytes(sk)
    assert len(raw) == 8
    assert raw[1] == 1 and raw[3] & 1  # SerVer 1, EMPTY flag
    back = kll_from_reference_bytes(raw)
    assert back.n == 0


def test_kll_single_item_round_trip():
    sk = KllSketch(200)
    sk.update(42.5)
    raw = kll_to_reference_bytes(sk)
    assert len(raw) == 12  # 8-byte preamble + one float
    assert raw[1] == 2 and raw[3] & 4  # SerVer 2, SINGLE flag
    back = kll_from_reference_bytes(raw)
    assert back.n == 1
    assert back.quantile(0.5) == 42.5


def test_kll_small_exact_round_trip():
    sk = KllSketch(200)
    vals = np.arange(1, 101, dtype=np.float64)
    sk.update_many(vals)
    raw = kll_to_reference_bytes(sk)
    # full-compact header checks
    assert raw[0] == 5 and raw[1] == 1 and raw[2] == 15
    (k,) = struct.unpack_from("<H", raw, 4)
    assert k == 200
    back = kll_from_reference_bytes(raw)
    assert back.n == 100
    assert back._min == 1.0 and back._max == 100.0
    np.testing.assert_array_equal(np.sort(back.levels[0]), vals)


def test_kll_large_round_trip_preserves_weight_and_quantiles():
    rng = np.random.default_rng(11)
    sk = KllSketch(200)
    sk.update_many(rng.standard_normal(50_000))
    raw = kll_to_reference_bytes(sk)
    back = kll_from_reference_bytes(raw)
    assert back.n == sk.n
    # retained weight (sum of 2^level item weights) must equal n both sides
    for s in (sk, back):
        assert sum(len(l) << i for i, l in enumerate(s.levels)) == s.n
    # image must honor the reference capacity bound for its numLevels
    num_levels = raw[18]
    retained = sum(len(l) for l in back.levels)
    assert retained <= _ref_total_capacity(200, num_levels)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert back.quantile(q) == pytest.approx(
            np.float32(sk.quantile(q)), abs=3e-2
        )


def test_kll_updatable_format_read():
    # synthesize a SerVer-3 (updatable) float image: levels arr carries the
    # top fence and the items array is full capacity with a garbage gap
    k, num_levels = 200, 1
    items = np.array([5.0, 1.0, 3.0], dtype="<f4")
    cap = _ref_total_capacity(k, num_levels)
    lvl0 = cap - len(items)
    fences = np.array([lvl0, cap], dtype="<i4")
    full = np.zeros(cap, dtype="<f4")
    full[lvl0:] = items
    raw = (
        struct.pack("<BBBBHBB", 5, 3, 15, 0, k, 8, 0)
        + struct.pack("<qHBB", 3, k, num_levels, 0)
        + fences.tobytes()
        + struct.pack("<ff", 1.0, 5.0)
        + full.tobytes()
    )
    sk = kll_from_reference_bytes(raw)
    assert sk.n == 3
    np.testing.assert_array_equal(np.sort(sk.levels[0]), [1.0, 3.0, 5.0])
    assert sk.quantile(0.0) == 1.0 and sk.quantile(1.0) == 5.0


def test_kll_doubles_image_read():
    # full-compact doubles image (flags bit 8): same layout with 8-byte items
    k, num_levels = 200, 1
    items = np.array([2.25, 7.5], dtype="<f8")
    cap = _ref_total_capacity(k, num_levels)
    fences = np.array([cap - len(items)], dtype="<i4")
    raw = (
        struct.pack("<BBBBHBB", 5, 1, 15, 8, k, 8, 0)
        + struct.pack("<qHBB", 2, k, num_levels, 0)
        + fences.tobytes()
        + struct.pack("<dd", 2.25, 7.5)
        + items.tobytes()
    )
    sk = kll_from_reference_bytes(raw)
    assert sk.n == 2
    np.testing.assert_array_equal(np.sort(sk.levels[0]), [2.25, 7.5])


def test_kll_doubles_single_item_read():
    raw = struct.pack("<BBBBHBBd", 2, 2, 15, 8 | 4, 200, 8, 0, 3.5)
    sk = kll_from_reference_bytes(raw)
    assert sk.n == 1
    assert sk.quantile(0.5) == 3.5


def test_kll_bad_images_rejected():
    with pytest.raises(SketchesArgumentError, match="too small"):
        kll_from_reference_bytes(b"\x05\x01")
    with pytest.raises(SketchesArgumentError, match="KLL"):
        kll_from_reference_bytes(struct.pack("<BBBBHBB", 5, 1, 3, 0, 200, 8, 0))


# ---------------------------------------------------------------------------
# tuple CompactSketch images
# ---------------------------------------------------------------------------

from raydedup.interop import tuple_from_bytes, tuple_to_bytes  # noqa: E402
from raydedup.kmv import MAX_THETA as _MT  # noqa: E402
from raydedup.sketches.tuple import TupleSketch  # noqa: E402


def test_tuple_golden_cpp_empty():
    raw = (RESOURCES / "tuple-int-empty-cpp.sk").read_bytes()
    sk = tuple_from_bytes(raw)
    assert len(sk.hashes) == 0 and sk.theta == _MT
    assert sk.estimate() == 0.0


def test_tuple_golden_cpp_single():
    raw = (RESOURCES / "tuple-int-single-cpp.sk").read_bytes()
    sk = tuple_from_bytes(raw)
    assert len(sk.hashes) == 1 and sk.theta == _MT
    assert sk.values[0, 0] == 1.0  # C++ test wrote summary value 1


def test_tuple_golden_cpp_two():
    raw = (RESOURCES / "tuple-int-two-cpp.sk").read_bytes()
    sk = tuple_from_bytes(raw)
    assert len(sk.hashes) == 2 and sk.theta == _MT
    assert list(sk.values[:, 0]) == [1.0, 1.0]
    assert np.all(np.diff(sk.hashes.astype(np.uint64)) > 0)


def test_tuple_golden_cpp_estimation():
    # SerialVersion3Test.estimationModeFromCpp: 4096 retained, estimating
    raw = (RESOURCES / "tuple-int-est-trim-cpp.sk").read_bytes()
    sk = tuple_from_bytes(raw)
    assert len(sk.hashes) == 4096
    assert sk.theta < _MT
    assert np.all(sk.hashes < sk.theta)


def test_tuple_golden_server2_legacy():
    # SerialVersion3Test.version2Compatibility: 2*4096 distinct keys trimmed
    # to k=4096, theta < MAX, not empty, estimating
    raw = (RESOURCES / "TupleWithTestIntegerSummary4kTrimmedSerVer2.sk").read_bytes()
    sk = tuple_from_bytes(raw, summary="int32")
    assert len(sk.hashes) == 4096
    assert sk.theta < _MT
    assert sk.estimate() == pytest.approx(8192, rel=0.05)


def test_tuple_golden_server1_double_summary():
    # CompactSketchWithDoubleSummaryTest.serialVersion1Compatibility:
    # estimating, ~8192 estimate, 4096 retained, every summary value 1.0
    raw = (RESOURCES / "CompactSketchWithDoubleSummary4K_serialVersion1.sk").read_bytes()
    sk = tuple_from_bytes(raw, summary="double_mode")
    assert sk.theta < _MT
    assert len(sk.hashes) == 4096
    assert sk.estimate() == pytest.approx(8192, rel=0.05)
    assert np.all(sk.values[:, 0] == 1.0)


def test_tuple_rejects_v091_union_like_reference():
    # ArrayOfDoublesUnionTest.noSupportHeapifyV0_9_1: the reference throws on
    # this pre-1.0 image; we must reject it too (it is not a CompactSketch)
    raw = (RESOURCES / "ArrayOfDoublesUnion_v0.9.1.sk").read_bytes()
    with pytest.raises(SketchesArgumentError):
        tuple_from_bytes(raw)


def _mk_tuple(nkeys, k=64, mode="sum"):
    rng = np.random.default_rng(5)
    sk = TupleSketch.empty(k, 1, mode)
    h = rng.integers(1, 2**63, size=nkeys, dtype=np.uint64)
    return sk.update_many(h, np.arange(1, nkeys + 1, dtype=np.float64).reshape(-1, 1))


@pytest.mark.parametrize("summary", ["int32", "int32_mode", "double_mode"])
def test_tuple_round_trip_exact(summary):
    sk = _mk_tuple(10)
    raw = tuple_to_bytes(sk, summary=summary)
    back = tuple_from_bytes(raw, summary=summary, k=sk.k, mode=sk.mode)
    assert back.theta == sk.theta
    np.testing.assert_array_equal(back.hashes, sk.hashes)
    np.testing.assert_array_equal(back.values, np.floor(sk.values))
    assert back.mode == sk.mode


def test_tuple_round_trip_estimating_and_algebra():
    sk = _mk_tuple(500, k=64, mode="min")
    assert sk.theta < _MT
    raw = tuple_to_bytes(sk, summary="double_mode")
    back = tuple_from_bytes(raw, summary="double_mode", k=sk.k)
    assert back.mode == "min"  # mode byte round-trips
    assert back.theta == sk.theta
    np.testing.assert_array_equal(back.hashes, sk.hashes)
    np.testing.assert_array_equal(back.values, sk.values)
    inter = back.intersect(sk)
    assert len(inter.hashes) == len(sk.hashes)


def test_tuple_round_trip_empty_and_single():
    empty = TupleSketch.empty(16)
    raw = tuple_to_bytes(empty)
    assert len(raw) == 8 and raw[5] & 4  # EMPTY flag
    assert len(tuple_from_bytes(raw).hashes) == 0
    single = TupleSketch.empty(16).update_many(
        np.array([777], dtype=np.uint64), np.array([[3.0]])
    )
    raw = tuple_to_bytes(single)
    assert raw[0] == 1 and len(raw) == 8 + 12  # preLongs=1, interleaved rec
    back = tuple_from_bytes(raw)
    assert list(back.hashes) == [777] and back.values[0, 0] == 3.0


def test_tuple_vector_summary_rejected():
    sk = TupleSketch.empty(16, num_values=3)
    with pytest.raises(SketchesArgumentError, match="scalar"):
        tuple_to_bytes(sk)


# ---------------------------------------------------------------------------
# theta SerVer-1/2 forward compatibility
# (legacy layouts from test/theta/BackwardConversions.java:38-86,:104-182;
# synthesized images mirror that converter, as ForwardCompatibilityTest does)
# ---------------------------------------------------------------------------


def _to_v1(sk: KmvSketch) -> bytes:
    import struct as _s

    count = len(sk.hashes)
    out = bytearray((3 + count) * 8)
    out[0], out[1], out[2], out[6] = 3, 1, 3, 2  # MD_LONGS, SerVer, SetSketch, RO|LE
    _s.pack_into("<i", out, 8, count)
    _s.pack_into("<Q", out, 16, int(sk.theta))
    out[24:] = np.sort(sk.hashes).astype("<u8").tobytes()
    return bytes(out)


def _to_v2(sk: KmvSketch, seed: int = 9001) -> bytes:
    import struct as _s

    count = len(sk.hashes)
    estimating = int(sk.theta) != int(MAX_THETA)
    if count == 0 and not estimating:
        out = bytearray(8)
        out[0], out[1], out[2], out[5] = 1, 2, 3, 0xE
        _s.pack_into("<H", out, 6, compute_seed_hash(seed))
        return bytes(out)
    pre_longs = 3 if estimating else 2
    out = bytearray((pre_longs + count) * 8)
    out[0], out[1], out[2], out[5] = pre_longs, 2, 3, 0xA
    _s.pack_into("<H", out, 6, compute_seed_hash(seed))
    _s.pack_into("<i", out, 8, count)
    if estimating:
        _s.pack_into("<Q", out, 16, int(sk.theta))
    out[pre_longs * 8 :] = np.sort(sk.hashes).astype("<u8").tobytes()
    return bytes(out)


@pytest.mark.parametrize("n", [0, 1, 10, 500])
def test_theta_serv1_forward_compat(n):
    rng = np.random.default_rng(n + 1)
    sk = build_sketch(rng.integers(1, 1 << 62, n, dtype=np.uint64), k=64)
    back = theta_from_bytes(_to_v1(sk))
    assert back.theta == sk.theta
    assert np.array_equal(np.sort(back.hashes), np.sort(sk.hashes))
    assert back.estimate() == pytest.approx(sk.estimate())


@pytest.mark.parametrize("n", [0, 1, 10, 500])
def test_theta_serv2_forward_compat(n):
    rng = np.random.default_rng(n + 9)
    sk = build_sketch(rng.integers(1, 1 << 62, n, dtype=np.uint64), k=64)
    back = theta_from_bytes(_to_v2(sk))
    assert back.theta == sk.theta
    assert np.array_equal(np.sort(back.hashes), np.sort(sk.hashes))


def test_theta_serv2_rejects_wrong_seed_hash():
    sk = build_sketch(np.arange(1, 40, dtype=np.uint64), k=64)
    raw = bytearray(_to_v2(sk))
    raw[6] ^= 0xFF
    with pytest.raises(SketchesArgumentError):
        theta_from_bytes(bytes(raw))


def test_theta_legacy_rejects_alpha_sketch_type():
    sk = build_sketch(np.arange(1, 40, dtype=np.uint64), k=64)
    raw = bytearray(_to_v1(sk))
    raw[2] = 1  # AlphaSketch
    with pytest.raises(SketchesArgumentError):
        theta_from_bytes(bytes(raw))
