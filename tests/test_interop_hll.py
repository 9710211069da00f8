"""HLL wire-format conformance.

No golden HLL binaries ship in the reference test resources, so conformance
is: (a) reading synthetic images constructed byte-by-byte per the documented
layouts (hll/PreambleUtil.java:38-88, coupon encoding hll/HllUtil.java:
131-141), (b) write→read round-trips across all three target types, and
(c) cross-type register equality (Hll4/6/8 images of the same state decode
identically, including HLL_4 curMin offsets and AUX_TOKEN exceptions).
"""

import struct

import numpy as np
import pytest

from raydedup.interop_hll import (
    HllFormatError,
    hll_from_reference_bytes,
    hll_to_reference_bytes,
)
from raydedup.sketches.hll import HllSketch


def _coupon(addr26: int, value: int) -> int:
    return (value << 26) | addr26


def _make_list_image(lg_k: int, coupons: list[int], compact: bool = True) -> bytes:
    lg_arr = max(3, (len(coupons) - 1).bit_length())
    n_ints = len(coupons) if compact else (1 << lg_arr)
    out = bytearray(8 + 4 * n_ints)
    flags = (8 if compact else 0) | (4 if not coupons else 0)
    struct.pack_into("<8B", out, 0, 2, 1, 7, lg_k, lg_arr, flags, len(coupons), 0)
    for i, c in enumerate(coupons):
        struct.pack_into("<I", out, 8 + 4 * i, c)
    return bytes(out)


def _make_set_image(lg_k: int, coupons: list[int], compact: bool = True) -> bytes:
    lg_arr = 5
    while (1 << lg_arr) * 3 // 4 <= len(coupons):
        lg_arr += 1
    n_ints = len(coupons) if compact else (1 << lg_arr)
    out = bytearray(12 + 4 * n_ints)
    struct.pack_into("<8B", out, 0, 3, 1, 7, lg_k, lg_arr, 8 if compact else 0, 0, 1)
    struct.pack_into("<i", out, 8, len(coupons))
    if compact:
        for i, c in enumerate(coupons):
            struct.pack_into("<I", out, 12 + 4 * i, c)
    else:
        arr = np.zeros(1 << lg_arr, dtype=np.uint32)
        mask = (1 << lg_arr) - 1
        for c in coupons:
            j = c & mask
            while arr[j] != 0:
                j = (j + 1) & mask
            arr[j] = c
        out[12:] = arr.astype("<u4").tobytes()
    return bytes(out)


def test_read_coupon_list_image():
    coupons = [_coupon(5, 3), _coupon(700, 1), _coupon((1 << 20) + 5, 7)]
    sk = hll_from_reference_bytes(_make_list_image(10, coupons))
    # slot = addr26 & (k-1): addr (1<<20)+5 folds onto slot 5 with value 7
    assert sk.regs[5] == 7
    assert sk.regs[700 & 1023] == 1
    assert int(np.count_nonzero(sk.regs)) == 2


@pytest.mark.parametrize("compact", [True, False])
def test_read_coupon_set_image(compact):
    rng = np.random.default_rng(7)
    coupons = [
        _coupon(int(a), int(v))
        for a, v in zip(rng.integers(0, 1 << 26, 40), rng.integers(1, 30, 40))
    ]
    sk = hll_from_reference_bytes(_make_set_image(12, coupons, compact))
    expect = np.zeros(1 << 12, dtype=np.uint8)
    for c in coupons:
        expect[c & 4095] = max(expect[c & 4095], c >> 26)
    assert np.array_equal(sk.regs, expect)


def _dense(lg_k: int, n: int, spread: int = 40) -> HllSketch:
    sk = HllSketch(lg_k)
    rng = np.random.default_rng(3)
    sk.sparse = None
    sk.regs = np.minimum(
        rng.geometric(0.5, size=1 << lg_k), spread
    ).astype(np.uint8)
    sk.regs[: max(0, (1 << lg_k) - n)] = 0
    return sk


@pytest.mark.parametrize("tgt", ["hll8", "hll6", "hll4"])
@pytest.mark.parametrize("compact", [True, False])
def test_roundtrip_all_types(tgt, compact):
    sk = _dense(11, 1600)
    raw = hll_to_reference_bytes(sk, tgt=tgt, compact=compact)
    back = hll_from_reference_bytes(raw)
    assert np.array_equal(back.regs, sk.regs)


def test_cross_type_images_decode_identically():
    sk = _dense(10, 1024)
    sk.regs += 2  # push curMin above zero to exercise the HLL_4 offset
    decoded = [
        hll_from_reference_bytes(hll_to_reference_bytes(sk, tgt=t)).regs
        for t in ("hll8", "hll6", "hll4")
    ]
    assert np.array_equal(decoded[0], decoded[1])
    assert np.array_equal(decoded[0], decoded[2])


def test_hll4_exceptions():
    sk = HllSketch(10)
    sk.sparse = None
    sk.regs = np.full(1 << 10, 3, dtype=np.uint8)
    sk.regs[17] = 25  # 25 - curMin(3) = 22 >= 15 -> aux exception
    sk.regs[900] = 40
    for compact in (True, False):
        raw = hll_to_reference_bytes(sk, tgt="hll4", compact=compact)
        back = hll_from_reference_bytes(raw)
        assert back.regs[17] == 25 and back.regs[900] == 40
        assert np.array_equal(back.regs, sk.regs)


def test_hip_preferred_when_in_order():
    sk = _dense(11, 1000)
    raw = bytearray(hll_to_reference_bytes(sk, tgt="hll8"))
    raw[5] &= ~16  # clear OUT_OF_ORDER
    struct.pack_into("<d", raw, 8, 12345.0)  # plant a HIP accumulator
    back = hll_from_reference_bytes(bytes(raw))
    assert back.estimate() == 12345.0
    back.merge(_dense(11, 10))  # merge invalidates HIP
    assert back.estimate() != 12345.0


def test_estimate_sane_through_wire():
    sk = HllSketch(12)
    rng = np.random.default_rng(11)
    sk.update_hashes(rng.integers(0, 1 << 63, 50_000, dtype=np.uint64))
    back = hll_from_reference_bytes(hll_to_reference_bytes(sk, tgt="hll4"))
    assert back.estimate() == pytest.approx(sk.estimate(), rel=1e-9)


def test_union_of_wire_images():
    a, b = _dense(11, 800), _dense(11, 800)
    b.regs = b.regs[::-1].copy()
    ra = hll_from_reference_bytes(hll_to_reference_bytes(a))
    rb = hll_from_reference_bytes(hll_to_reference_bytes(b))
    ra.merge(rb)
    assert np.array_equal(ra.regs, np.maximum(a.regs, b.regs))


def test_rejects_garbage():
    with pytest.raises(HllFormatError):
        hll_from_reference_bytes(b"\x02\x01\x08\x0b\x00\x00\x00\x00")  # wrong family
    with pytest.raises(HllFormatError):
        hll_from_reference_bytes(b"\x02\x09\x07\x0b\x00\x00\x00\x00")  # wrong serVer
