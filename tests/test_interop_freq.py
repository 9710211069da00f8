"""Wire-format conformance for the frequencies family (family 10).

No golden frequencies binaries ship in the reference resources; conformance
is layout-exact write→read round-trips across the empty/active branches and
both payload codecs (longs, ArrayOfStringsSerDe), estimator preservation
through the offset lower/upper-bound conversion, and malformed-image
rejection — mirroring frequencies/LongsSketchTest serde coverage.
"""

import struct

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.interop_freq import (
    freq_longs_from_bytes,
    freq_longs_to_bytes,
    freq_string_items_from_bytes,
    freq_string_items_to_bytes,
)
from raydedup.sketches.freq import FrequentItemsSketch, FrequentKeysSketch


def test_longs_empty_image():
    raw = freq_longs_to_bytes(FrequentKeysSketch(64))
    assert len(raw) == 8
    assert raw[0] == 1 and raw[1] == 1 and raw[2] == 10
    assert raw[3] == 6  # lgMaxMapSize
    assert raw[5] & 4  # EMPTY flag
    back = freq_longs_from_bytes(raw)
    assert back.stream_len == 0 and not back.counts


@pytest.mark.parametrize("n,mms", [(10, 64), (5000, 64), (100_000, 256)])
def test_longs_roundtrip(n, mms):
    sk = FrequentKeysSketch(mms)
    rng = np.random.default_rng(n)
    keys = rng.zipf(1.3, size=n).astype(np.int64)
    for chunk in np.array_split(keys, 7):
        sk.update_many(chunk)
    raw = freq_longs_to_bytes(sk)
    active = len(sk.counts)
    assert len(raw) == 32 + 16 * active
    back = freq_longs_from_bytes(raw)
    assert back.stream_len == sk.stream_len == n
    assert back.offset == sk.offset
    assert back.counts == sk.counts
    # estimator + frequent-items survive the lower/upper bound conversion
    for k, _ in sk.get_frequent_items()[:5]:
        assert back.get_estimate(k) == sk.get_estimate(k)
    assert back.get_frequent_items() == sk.get_frequent_items()
    # wire stores LOWER bounds: first value long == estimate - offset
    first_key = next(iter(sk.counts))
    (first_val,) = struct.unpack_from("<q", raw, 32)
    assert first_val == sk.counts[first_key] - sk.offset


def test_longs_layout_values_before_keys():
    sk = FrequentKeysSketch(64)
    sk.update(7, 3)
    sk.update(9, 5)
    raw = freq_longs_to_bytes(sk)
    vals = np.frombuffer(raw, dtype="<i8", count=2, offset=32)
    keys = np.frombuffer(raw, dtype="<i8", count=2, offset=48)
    assert dict(zip(keys.tolist(), vals.tolist())) == {7: 3, 9: 5}


@pytest.mark.parametrize("n", [0, 12, 20_000])
def test_string_items_roundtrip(n):
    sk = FrequentItemsSketch(64)
    rng = np.random.default_rng(n)
    toks = [f"tok{z}" for z in rng.zipf(1.5, size=n)] if n else []
    if toks:
        ks, cs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        sk.update_many(ks, cs)
    raw = freq_string_items_to_bytes(sk)
    back = freq_string_items_from_bytes(raw)
    assert back.stream_len == sk.stream_len
    assert back.offset == sk.offset
    assert back.counts == sk.counts
    assert back.get_frequent_items() == sk.get_frequent_items()


def test_string_items_utf8():
    sk = FrequentItemsSketch(64)
    sk.update_many(np.asarray(["héllo", "héllo", "日本語"], dtype=object))
    back = freq_string_items_from_bytes(freq_string_items_to_bytes(sk))
    assert back.counts == {"héllo": 2, "日本語": 1}


def test_rejects_bad_family_and_serveur():
    raw = bytearray(freq_longs_to_bytes(FrequentKeysSketch(64)))
    raw[2] = 3
    with pytest.raises(SketchesArgumentError):
        freq_longs_from_bytes(bytes(raw))
    raw[2] = 10
    raw[1] = 2
    with pytest.raises(SketchesArgumentError):
        freq_longs_from_bytes(bytes(raw))


def test_rejects_truncated():
    sk = FrequentKeysSketch(64)
    sk.update_many(np.arange(10, dtype=np.int64))
    raw = freq_longs_to_bytes(sk)
    with pytest.raises(SketchesArgumentError):
        freq_longs_from_bytes(raw[:40])
    sks = FrequentItemsSketch(64)
    sks.update_many(np.asarray(["abc", "defg"], dtype=object))
    raws = freq_string_items_to_bytes(sks)
    with pytest.raises(SketchesArgumentError):
        freq_string_items_from_bytes(raws[:-3])


def test_merge_through_wire():
    a, b = FrequentKeysSketch(32), FrequentKeysSketch(32)
    rng = np.random.default_rng(5)
    a.update_many(rng.zipf(1.2, size=50_000).astype(np.int64))
    b.update_many(rng.zipf(1.2, size=50_000).astype(np.int64))
    ra = freq_longs_from_bytes(freq_longs_to_bytes(a))
    rb = freq_longs_from_bytes(freq_longs_to_bytes(b))
    direct = FrequentKeysSketch(32)
    direct.counts, direct.offset, direct.stream_len = dict(a.counts), a.offset, a.stream_len
    direct.merge(b)
    ra.merge(rb)
    assert ra.stream_len == direct.stream_len
    assert ra.counts == direct.counts and ra.offset == direct.offset
