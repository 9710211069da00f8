"""Wire conformance for the ArrayOfDoubles tuple family (family 9).

Golden coverage: ``ArrayOfDoublesUnion_v0.9.1.sk`` — the reference rejects
it as a union (``ArrayOfDoublesUnionTest.noSupportHeapifyV0_9_1``) because
pre-1.0 unions lack the 16-byte wrapper; its body IS a current-layout
QuickSelect image (serVer 1, type 2, lgK 12, 4096 retained), which
exercises the QS reader against reference-written bytes. The fixture was
built by unioning two 8192-key streams with 1/3 overlap, so the estimate
(~12288) and mean summary (~4/3) are checkable.
"""

import struct

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.interop import compute_seed_hash
from raydedup.interop_aod import (
    aod_compact_from_bytes,
    aod_compact_to_bytes,
    aod_qs_from_bytes,
    aod_qs_to_bytes,
    aod_union_from_bytes,
    aod_union_to_bytes,
)
from raydedup.kmv import MAX_THETA
from raydedup.sketches.tuple import TupleSketch

from .test_interop import RESOURCES


def _mk(n, k=64, nv=2, mode="sum", seed=7):
    rng = np.random.default_rng(seed)
    sk = TupleSketch.empty(k, nv, mode)
    if n:
        sk = sk.update_many(
            rng.integers(1, 2**63, size=n, dtype=np.uint64), rng.random((n, nv))
        )
    return sk


# ---------------------------------------------------------------------------
# golden file

def test_golden_v091_union_rejected_like_reference():
    raw = (RESOURCES / "ArrayOfDoublesUnion_v0.9.1.sk").read_bytes()
    with pytest.raises(SketchesArgumentError, match="type mismatch"):
        aod_union_from_bytes(raw)


def test_golden_v091_body_reads_as_quickselect():
    raw = (RESOURCES / "ArrayOfDoublesUnion_v0.9.1.sk").read_bytes()
    sk = aod_qs_from_bytes(raw)
    assert len(sk.hashes) == 4096
    assert sk.k == 4096  # lgNomEntries 12
    assert sk.values.shape[1] == 1
    assert sk.theta < MAX_THETA
    assert sk.estimate() == pytest.approx(12288, rel=0.04)
    # sum-mode doubles: 1.0 per stream, 2.0 on the 1/3 overlap
    assert set(np.unique(sk.values)) <= {1.0, 2.0}
    assert sk.values.mean() == pytest.approx(4 / 3, rel=0.05)
    # layout spot-checks against raw bytes
    assert raw[3] == 2 and raw[5] == 1
    assert struct.unpack_from("<H", raw, 6)[0] == compute_seed_hash()
    assert len(raw) == 32 + (1 << raw[17]) * (8 + 8 * raw[5])


# ---------------------------------------------------------------------------
# compact

def test_compact_empty_image_is_16_bytes():
    raw = aod_compact_to_bytes(TupleSketch.empty(64, 3))
    assert len(raw) == 16
    assert raw[:6] == bytes([1, 1, 9, 3, 4, 3])  # preLongs,serVer,fam,type,EMPTY,nv
    assert struct.unpack_from("<q", raw, 8)[0] == (1 << 63) - 1  # Long.MAX_VALUE
    back = aod_compact_from_bytes(raw)
    assert back.theta == MAX_THETA and len(back.hashes) == 0
    assert back.values.shape == (0, 3)


@pytest.mark.parametrize("n,nv", [(1, 1), (10, 4), (500, 2)])
def test_compact_roundtrip(n, nv):
    sk = _mk(n, nv=nv)
    raw = aod_compact_to_bytes(sk)
    count = len(sk.hashes)
    assert len(raw) == 24 + count * (8 + 8 * nv)
    assert raw[4] == 8  # HAS_ENTRIES, not EMPTY
    back = aod_compact_from_bytes(raw, k=sk.k)
    assert back.theta == sk.theta
    np.testing.assert_array_equal(back.hashes, sk.hashes)
    np.testing.assert_array_equal(back.values, sk.values)


def test_compact_layout_keys_then_values():
    sk = _mk(3, nv=2)
    raw = aod_compact_to_bytes(sk)
    keys = np.frombuffer(raw, dtype="<u8", count=3, offset=24)
    vals = np.frombuffer(raw, dtype="<f8", count=6, offset=48).reshape(3, 2)
    np.testing.assert_array_equal(keys, sk.hashes)
    np.testing.assert_array_equal(vals, sk.values)


# ---------------------------------------------------------------------------
# QuickSelect

@pytest.mark.parametrize("n", [0, 1, 29, 500])
def test_qs_roundtrip(n):
    sk = _mk(n, k=64, nv=2)
    raw = aod_qs_to_bytes(sk)
    lg_cur = raw[17]
    assert len(raw) == 32 + (1 << lg_cur) * (8 + 8 * 2)
    back = aod_qs_from_bytes(raw)
    assert back.theta == sk.theta and back.k == sk.k
    np.testing.assert_array_equal(back.hashes, sk.hashes)
    np.testing.assert_array_equal(back.values, sk.values)


def test_qs_table_placement_matches_reference_probe():
    """Every key must sit on its own probe chain (start hash&mask, stride
    2*((hash>>>lgCap)&127)+1) with no empty slot before it — the invariant
    the reference relies on when it wraps the image and keeps updating."""
    sk = _mk(500, k=64, nv=1)
    raw = aod_qs_to_bytes(sk)
    lg_cur = raw[17]
    cap = 1 << lg_cur
    table = np.frombuffer(raw, dtype="<u8", count=cap, offset=32)
    for h in sk.hashes.tolist():
        cur = h & (cap - 1)
        stride = 2 * ((h >> lg_cur) & 127) + 1
        for _ in range(cap):
            assert table[cur] != 0, "probe chain hit an empty slot before the key"
            if table[cur] == h:
                break
            cur = (cur + stride) & (cap - 1)
        else:
            pytest.fail("key not found on its probe chain")


def test_qs_rejects_wrong_type_and_truncation():
    sk = _mk(10)
    raw = bytearray(aod_qs_to_bytes(sk))
    with pytest.raises(SketchesArgumentError, match="type mismatch"):
        aod_compact_from_bytes(bytes(raw))
    with pytest.raises(SketchesArgumentError, match="truncated"):
        aod_qs_from_bytes(bytes(raw[:40]))
    raw[6] ^= 0xFF
    with pytest.raises(SketchesArgumentError, match="seed hash"):
        aod_qs_from_bytes(bytes(raw))


# ---------------------------------------------------------------------------
# union

def test_union_roundtrip_and_wrapper_layout():
    sk = _mk(500, k=64, nv=2)
    raw = aod_union_to_bytes(sk)
    assert raw[:4] == bytes([1, 1, 9, 4])
    assert struct.unpack_from("<i", raw, 4)[0] == 0  # bytes 4-7 zero
    assert struct.unpack_from("<q", raw, 8)[0] == int(sk.theta)
    # body is a complete QS image
    body = aod_qs_from_bytes(raw[16:])
    np.testing.assert_array_equal(body.hashes, sk.hashes)
    back = aod_union_from_bytes(raw)
    assert back.theta == sk.theta
    np.testing.assert_array_equal(back.hashes, sk.hashes)
    np.testing.assert_array_equal(back.values, sk.values)


def test_union_theta_clamps_gadget():
    """Union theta below the gadget theta trims entries on heapify (the
    reference applies min(unionTheta, gadget theta) via getResult)."""
    sk = _mk(500, k=64, nv=1)
    raw = bytearray(aod_union_to_bytes(sk))
    lower = int(sk.theta) // 2
    struct.pack_into("<q", raw, 8, lower)
    back = aod_union_from_bytes(bytes(raw))
    assert back.theta == np.uint64(lower)
    assert np.all(back.hashes < np.uint64(lower))
    assert len(back.hashes) == int(np.sum(sk.hashes < np.uint64(lower)))


def test_union_rejects_bad_serial_version():
    sk = _mk(10)
    raw = bytearray(aod_union_to_bytes(sk))
    raw[1] = 2
    with pytest.raises(SketchesArgumentError, match="[Ss]erial version"):
        aod_union_from_bytes(bytes(raw))
