"""AlphaSketch (theta/HeapAlphaSketch.java) contract + wire-interop tests."""

import struct

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.interop import (
    alpha_from_bytes,
    alpha_to_bytes,
    compute_seed_hash,
    quickselect_from_bytes,
    quickselect_to_bytes,
)
from raydedup.kmv import MAX_THETA, KmvSketch, build_sketch, intersection, union
from raydedup.sketches.alpha import AlphaSketch


def _stream(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)


def test_min_lg_k_enforced():
    # HeapAlphaSketch.java:62 — smallest nominal entries is 512
    with pytest.raises(SketchesArgumentError):
        AlphaSketch(lg_k=8)
    AlphaSketch(lg_k=9)


def test_exact_mode_is_exact():
    sk = AlphaSketch(lg_k=9)
    sk.update_hashes(np.arange(1, 513, dtype=np.uint64))
    assert not sk.is_estimation_mode
    assert sk.estimate() == 512.0
    assert sk.lower_bound() == sk.upper_bound() == 512.0


def test_duplicates_do_not_move_estimate():
    h = _stream(20_000, 3)
    sk = AlphaSketch(lg_k=9)
    sk.update_hashes(h)
    e1 = sk.estimate()
    sk.update_hashes(h)
    assert sk.estimate() == e1


def test_alpha_rse_beats_quickselect():
    # asymptotic alpha RSE ~ 1/sqrt(2k) (HeapAlphaSketch javadoc);
    # QuickSelect/KMV RSE ~ 1/sqrt(k). 30 trials at k=512, n=60k.
    k = 512
    errs = []
    for t in range(30):
        sk = AlphaSketch(lg_k=9)
        sk.update_hashes(_stream(60_000, 100 + t))
        errs.append(sk.estimate() / 60_000 - 1.0)
    errs = np.array(errs)
    assert abs(errs.mean()) < 0.02  # unbiased
    rse = errs.std()
    assert rse < 1.5 / np.sqrt(2 * k)  # near the alpha bound
    assert rse < 1.0 / np.sqrt(k)  # strictly better than QS at equal k


def test_bounds_bracket_truth():
    hits = 0
    for t in range(20):
        sk = AlphaSketch(lg_k=9)
        sk.update_hashes(_stream(40_000, 200 + t))
        if sk.lower_bound(3) <= 40_000 <= sk.upper_bound(3):
            hits += 1
    assert hits >= 19  # 3-sigma bounds


def test_bounds_validate_num_std_dev():
    sk = AlphaSketch(lg_k=9)
    with pytest.raises(SketchesArgumentError):
        sk.lower_bound(0)
    with pytest.raises(SketchesArgumentError):
        sk.upper_bound(4)


def test_compact_feeds_theta_set_algebra():
    a_h = _stream(30_000, 5)
    b_h = np.concatenate([a_h[:15_000], _stream(15_000, 6)])
    a = AlphaSketch(lg_k=11)
    a.update_hashes(a_h)
    b = AlphaSketch(lg_k=11)
    b.update_hashes(b_h)
    ca, cb = a.compact(), b.compact()
    assert (ca.hashes < ca.theta).all()
    u = union(ca, cb, k=2048)
    i = intersection(ca, cb)
    assert abs(u.estimate() / 45_000 - 1) < 0.15
    assert abs(i.estimate() / 15_000 - 1) < 0.25


def test_rebuild_drops_dirty():
    sk = AlphaSketch(lg_k=9)
    sk.update_hashes(_stream(5_000, 9))
    assert sk.is_estimation_mode
    sk.rebuild()
    assert not sk.dirty
    assert sk.retained_entries(False) == sk.retained_entries(True)
    assert all(v < sk.theta for v in sk._set)


def test_alpha_wire_roundtrip():
    sk = AlphaSketch(lg_k=9)
    sk.update_hashes(_stream(25_000, 11))
    raw = alpha_to_bytes(sk)
    # preamble: preLongs=3 (+lgRF), SerVer 3, family ALPHA=1, lgNom, lgArr
    assert raw[0] & 0x3F == 3 and raw[1] == 3 and raw[2] == 1 and raw[3] == 9
    assert struct.unpack_from("<H", raw, 6)[0] == compute_seed_hash(9001)
    assert len(raw) == 24 + 8 * (1 << raw[4])
    back = alpha_from_bytes(raw)
    assert back.theta == sk.theta
    assert back.estimate() == sk.estimate()
    assert back._set == sk._set
    # heapified sketch keeps updating with the same semantics
    extra = _stream(5_000, 12)
    sk.update_hashes(extra)
    back.update_hashes(extra)
    assert back.estimate() == sk.estimate()


def test_alpha_wire_table_is_probe_placed():
    # entries sit where HashOperations.hashSearchOrInsert would put them
    sk = AlphaSketch(lg_k=9)
    sk.update_hashes(_stream(600, 13))
    raw = alpha_to_bytes(sk)
    lg_arr = raw[4]
    table = np.frombuffer(raw, dtype="<u8", count=1 << lg_arr, offset=24)
    mask = (1 << lg_arr) - 1
    for slot in np.flatnonzero(table != 0)[:50]:
        h = int(table[slot])
        stride = 2 * ((h >> lg_arr) & 127) + 1
        cur = h & mask
        while cur != slot:  # every earlier probe position must be occupied
            assert table[cur] != 0
            cur = (cur + stride) & mask
    back = alpha_from_bytes(raw)
    assert back._set == sk._set


def test_alpha_wire_rejects_bad_images():
    sk = AlphaSketch(lg_k=9)
    sk.update_hashes(_stream(1_000, 14))
    raw = bytearray(alpha_to_bytes(sk))
    with pytest.raises(SketchesArgumentError):
        alpha_from_bytes(bytes(raw), seed=123)  # seed mismatch
    bad = bytes(raw[:2]) + b"\x02" + bytes(raw[3:])
    with pytest.raises(SketchesArgumentError):
        alpha_from_bytes(bad)  # family 2 is not alpha
    with pytest.raises(SketchesArgumentError):
        alpha_from_bytes(bytes(raw[:100]))  # truncated table


def test_quickselect_wire_roundtrip():
    kmv = build_sketch(_stream(50_000, 15), k=4096)
    raw = quickselect_to_bytes(kmv)
    assert raw[2] == 2  # family QUICKSELECT
    back = quickselect_from_bytes(raw)
    assert back.theta == kmv.theta
    assert back.hashes.tolist() == kmv.hashes.tolist()
    assert back.k == 4096


def test_quickselect_wire_empty():
    kmv = KmvSketch(theta=MAX_THETA, hashes=np.zeros(0, dtype=np.uint64), k=16)
    back = quickselect_from_bytes(quickselect_to_bytes(kmv))
    assert len(back.hashes) == 0 and back.theta == MAX_THETA
