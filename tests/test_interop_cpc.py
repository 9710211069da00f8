"""CPC wire-format conformance against the reference's golden images.

Mirrors cpc/CpcCBinariesTest.java:40-160 (flavor + estimate per image) and
the round-trip byte-equality checks at :162-258. The images were generated
by the C++ implementation with HIP state, so getEstimate returns the HIP
accumulator (CpcSketch.java:138-141).
"""

from pathlib import Path

import numpy as np
import pytest

from raydedup.interop_cpc import (
    CpcFormatError,
    cpc_flavor,
    cpc_from_reference_bytes,
    cpc_to_reference_bytes,
    determine_correct_offset,
    determine_flavor,
)
from raydedup.sketches.cpc import CpcSketch, cpc_union


RESOURCES = Path("/root/reference/src/test/resources")

# (file, expected flavor, true n) as asserted in CpcCBinariesTest.java:40-160
GOLDEN = [
    ("cpc-empty.sk", "EMPTY", 0),
    ("cpc-sparse.sk", "SPARSE", 100),
    ("cpc-hybrid.sk", "HYBRID", 200),
    ("cpc-pinned.sk", "PINNED", 2000),
    ("cpc-sliding.sk", "SLIDING", 20000),
]


@pytest.mark.parametrize("name,flavor,n", GOLDEN)
def test_golden_image_flavor_and_estimate(name, flavor, n):
    sk = cpc_from_reference_bytes((RESOURCES / name).read_bytes())
    assert cpc_flavor(sk) == flavor
    if n == 0:
        assert sk.estimate() == 0.0
    else:
        assert sk.estimate() == pytest.approx(n, rel=0.02)  # the test's 2% bar


@pytest.mark.parametrize("name,flavor,n", GOLDEN)
def test_golden_image_roundtrip_byte_identical(name, flavor, n):
    raw = (RESOURCES / name).read_bytes()
    assert cpc_to_reference_bytes(cpc_from_reference_bytes(raw)) == raw


@pytest.mark.parametrize("name,flavor,n", GOLDEN[1:])
def test_icon_estimate_close_on_golden_matrices(name, flavor, n):
    # Force the merge path: ICON on the reconstructed coupon matrix must
    # also estimate n (within ~3 RSE = 3·ln2/√k).
    sk = cpc_from_reference_bytes((RESOURCES / name).read_bytes())
    sk.merge_flag = True
    assert sk.estimate() == pytest.approx(n, rel=3 * sk.rse)


def test_10m_image_rejected_like_reference():
    # cpc-10m.sk declares 4*(preInts+svLen+wLen)=664 bytes but holds 660;
    # the reference's CompressedState.importFromMemory checkCapacity rejects
    # it the same way (no reference test reads this file).
    raw = (RESOURCES / "cpc-10m.sk").read_bytes()
    with pytest.raises(CpcFormatError):
        cpc_from_reference_bytes(raw)


def _filled(lg_k: int, n: int, tag: int) -> CpcSketch:
    sk = CpcSketch(lg_k)
    sk.update_hashes(np.arange(n, dtype=np.uint64) + np.uint64(tag << 32))
    return sk


@pytest.mark.parametrize("n", [1, 50, 150, 400, 2000, 9000, 60000])
def test_own_sketch_roundtrip_all_flavors(n):
    # Drive our own sketches through every flavor and require exact matrix
    # recovery through the reference wire format.
    sk = _filled(10, n, 7)
    raw = cpc_to_reference_bytes(sk)
    back = cpc_from_reference_bytes(raw)
    assert np.array_equal(back.matrix, sk.matrix)
    assert cpc_to_reference_bytes(back) == raw


def test_union_of_golden_images_estimates_union():
    a = cpc_from_reference_bytes((RESOURCES / "cpc-pinned.sk").read_bytes())
    b = cpc_from_reference_bytes((RESOURCES / "cpc-sliding.sk").read_bytes())
    u = cpc_union([a, b])
    # The C++ generator fed 0..n-1 to both, so the true union is max(n)=20000.
    assert u.estimate() == pytest.approx(20000, rel=3 * u.rse)


def test_flavor_and_offset_rules():
    # CpcUtil.java:40-61 boundaries at k=1024
    assert determine_flavor(10, 0) == 0
    assert determine_flavor(10, 95) == 1  # < 3K/32 = 96
    assert determine_flavor(10, 96) == 2
    assert determine_flavor(10, 511) == 2  # < K/2
    assert determine_flavor(10, 512) == 3
    assert determine_flavor(10, 3455) == 3  # < 27K/8 = 3456
    assert determine_flavor(10, 3456) == 4
    assert determine_correct_offset(10, 3456) == 1  # (8C-19K)/8K
    assert determine_correct_offset(10, 2000) == 0
