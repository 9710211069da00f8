"""Wire-format conformance for the sampling and REQ families.

No golden binaries ship for these families; conformance is layout-exact
write→read round-trips across every format branch (empty / warm-up / full
varopt; empty / raw-items / exact / estimation REQ) plus malformed-image
rejection, mirroring the reference's own serde tests
(sampling/ReservoirLongsSketchTest, req/ReqSerDeTest strategy).
"""

import struct

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.interop_req import req_from_bytes, req_to_bytes
from raydedup.interop_sampling import (
    reservoir_longs_from_bytes,
    reservoir_longs_to_bytes,
    varopt_longs_from_bytes,
    varopt_longs_to_bytes,
)
from raydedup.sketches.req import ReqSketch
from raydedup.sketches.sampling import ReservoirSketch, VarOptItemsSketch


@pytest.mark.parametrize("n", [0, 3, 32, 500])
def test_reservoir_roundtrip(n):
    sk = ReservoirSketch(32)
    sk.update_many(list(range(n)))
    raw = reservoir_longs_to_bytes(sk)
    back = reservoir_longs_from_bytes(raw)
    assert back.k == 32 and back.n == n
    assert sorted(back.samples) == sorted(sk.samples)
    assert len(raw) == (8 if n == 0 else 16 + 8 * min(32, n))


def test_reservoir_serv1_pseudolog_k():
    # serVer-1 K is pseudo-log encoded (ReservoirSize.computeSize:
    # exponent<<11 | 2048-bin mantissa; ReservoirLongsSketch.java:213-215)
    from raydedup.interop_sampling import (
        _reservoir_size_decode,
        _reservoir_size_encode,
    )

    raw = bytearray(16 + 8)
    struct.pack_into("<4B", raw, 0, 2, 1, 11, 0)
    struct.pack_into("<H", raw, 4, _reservoir_size_encode(100))
    struct.pack_into("<q", raw, 8, 1)
    struct.pack_into("<q", raw, 16, 42)
    back = reservoir_longs_from_bytes(bytes(raw))
    assert back.k == 100 and back.samples == [42]
    # powers of two encode exactly with a zero mantissa index
    assert _reservoir_size_encode(1024) == 10 << 11
    assert _reservoir_size_decode(10 << 11) == 1024
    # decode(encode(k)) is the smallest representable size >= k
    for k in (1, 2, 3, 100, 1023, 1025, 32767, 100_000, 2_000_000):
        dk = _reservoir_size_decode(_reservoir_size_encode(k))
        assert k <= dk <= int(k * (1 + 1 / 1024.0)) + 1, k
    # the k=32767 mantissa-overflow case rounds up to the next octave
    assert _reservoir_size_decode(_reservoir_size_encode(32767)) == 32768


@pytest.mark.parametrize("n,k", [(0, 8), (5, 8), (8, 8), (1000, 8), (1000, 64)])
def test_varopt_roundtrip(n, k):
    sk = VarOptItemsSketch(k)
    rng = np.random.default_rng(n + k)
    for i in range(n):
        sk.update(i, float(rng.exponential() + 0.1))
    raw = varopt_longs_to_bytes(sk)
    back = varopt_longs_from_bytes(raw)
    assert back.k == k and back.n == n
    assert back.h == sk.h and back.r == sk.r
    assert back.total_wt_r == pytest.approx(sk.total_wt_r)
    assert sorted(back.samples()) == pytest.approx(sorted(sk.samples()))
    # estimator still works through the wire
    if n:
        est = back.estimate_subset_sum(lambda key: True)
        assert est.estimate == pytest.approx(sk.total_weight, rel=1e-9)


def test_varopt_rejects_gadget_flag():
    sk = VarOptItemsSketch(8)
    sk.update(1, 1.0)
    raw = bytearray(varopt_longs_to_bytes(sk))
    raw[3] |= 8  # GADGET flag
    with pytest.raises(SketchesArgumentError):
        varopt_longs_from_bytes(bytes(raw))


@pytest.mark.parametrize("n", [0, 3, 50, 5000, 120_000])
@pytest.mark.parametrize("hra", [True, False])
def test_req_roundtrip(n, hra):
    sk = ReqSketch(12, hra=hra)
    rng = np.random.default_rng(n + hra)
    vals = rng.normal(size=n).astype(np.float32).astype(np.float64)  # wire-exact items
    if n:
        sk.update_many(vals)
    raw = req_to_bytes(sk)
    back = req_from_bytes(raw)
    assert back.k == sk.k and back.hra == sk.hra and back.n == sk.n
    assert len(back.compactors) == len(sk.compactors)
    for a, b in zip(back.compactors, sk.compactors):
        assert np.array_equal(np.sort(a.items), np.sort(b.items))
    if n:
        for q in (0.01, 0.5, 0.99):
            assert back.quantile(q) == pytest.approx(sk.quantile(q), rel=1e-6)


def test_req_format_branches():
    empty = req_to_bytes(ReqSketch(12))
    assert len(empty) == 8 and empty[3] & 4
    sk = ReqSketch(12)
    sk.update_many(np.array([1.0, 2.0, 3.0]))
    raw_items = req_to_bytes(sk)
    assert raw_items[3] & 16 and raw_items[7] == 3  # RAWITEMS, numRawItems
    sk2 = ReqSketch(12)
    sk2.update_many(np.arange(40, dtype=np.float64))
    exact = req_to_bytes(sk2)
    assert exact[0] == 2 and exact[6] == 1  # EXACT: preInts 2, 1 compactor
    sk3 = ReqSketch(12)
    sk3.update_many(np.arange(120_000, dtype=np.float64))
    est = req_to_bytes(sk3)
    assert est[0] == 4 and est[6] > 1  # ESTIMATION


def test_req_rejects_bad_family():
    raw = bytearray(req_to_bytes(ReqSketch(12)))
    raw[2] = 9
    with pytest.raises(SketchesArgumentError):
        req_from_bytes(bytes(raw))


def test_merge_through_wire():
    a, b = ReqSketch(12), ReqSketch(12)
    rng = np.random.default_rng(1)
    a.update_many(rng.normal(size=50_000).astype(np.float32).astype(np.float64))
    b.update_many(rng.normal(size=50_000).astype(np.float32).astype(np.float64))
    ra = req_from_bytes(req_to_bytes(a))
    ra.merge(req_from_bytes(req_to_bytes(b)))
    direct = a.merge(b)
    assert ra.n == direct.n
    assert ra.quantile(0.5) == pytest.approx(direct.quantile(0.5), abs=0.05)
