"""Wire-format tests for generic-item (string) KLL images."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from raydedup.config import SketchesArgumentError
from raydedup.interop import _ref_total_capacity
from raydedup.interop_kll_items import (
    _write_items,
    kll_items_from_reference_bytes,
    kll_items_to_reference_bytes,
)
from raydedup.sketches.kll_items import KllItemsSketch


def _words(n: int, seed: int = 7) -> list[str]:
    rng = np.random.default_rng(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    return [
        "".join(alpha[i] for i in rng.integers(0, 26, size=rng.integers(3, 12)))
        for _ in range(n)
    ]


def test_roundtrip_empty_single_full():
    # empty
    sk = KllItemsSketch(200)
    rt = kll_items_from_reference_bytes(kll_items_to_reference_bytes(sk))
    assert rt.n == 0 and rt.num_retained == 0
    # single item (SerVer 2, serde payload at offset 8)
    sk.update("naïve-ünïcode")
    raw = kll_items_to_reference_bytes(sk)
    assert raw[1] == 2 and len(raw) == 8 + 4 + len("naïve-ünïcode".encode())
    rt = kll_items_from_reference_bytes(raw)
    assert rt.n == 1 and rt.quantile(0.5) == "naïve-ünïcode"
    # full: enough items to force multi-level compaction
    sk = KllItemsSketch(160, seed=3)
    words = _words(20_000)
    sk.update_many(words)
    rt = kll_items_from_reference_bytes(kll_items_to_reference_bytes(sk))
    assert rt.n == sk.n
    assert rt.min_value == sk.min_value == min(words)
    assert rt.max_value == sk.max_value == max(words)
    for r in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert rt.quantile(r) == sk.quantile(r)
    assert abs(rt.rank(words[17]) - sk.rank(words[17])) < 1e-12


def test_roundtrip_is_canonical_fixpoint():
    """read(write(sk)) then write again must be byte-identical (no drift)."""
    sk = KllItemsSketch(200, seed=1)
    sk.update_many(_words(5_000, seed=11))
    raw1 = kll_items_to_reference_bytes(sk)
    raw2 = kll_items_to_reference_bytes(kll_items_from_reference_bytes(raw1))
    assert raw1 == raw2


def test_read_synthesized_reference_layout_image():
    """Hand-build a compact items image straight from the documented layout
    (preamble + fences + serde'd min/max + retained, level-0 first) and
    check the heapified sketch answers exact queries on it."""
    k, m = 8, 8
    num_levels = 2
    cap = _ref_total_capacity(k, num_levels, m)
    # level 0 holds 3 weight-1 items, level 1 holds 2 weight-2 items
    lvl0 = ["delta", "echo", "foxtrot"]
    lvl1 = ["alpha", "bravo"]
    retained = lvl0 + lvl1
    fences = [cap - len(retained), cap - len(lvl1)]
    n = len(lvl0) + 2 * len(lvl1)
    raw = b"".join(
        [
            struct.pack("<BBBBHBB", 5, 1, 15, 2, k, m, 0),
            struct.pack("<qHBB", n, k, num_levels, 0),
            np.array(fences, dtype="<i4").tobytes(),
            _write_items(["alpha", "foxtrot"]),
            _write_items(retained),
        ]
    )
    sk = kll_items_from_reference_bytes(raw)
    assert sk.n == n
    assert sk.min_value == "alpha" and sk.max_value == "foxtrot"
    # exact weighted ranks: alpha(2) bravo(2) delta(1) echo(1) foxtrot(1)
    assert sk.quantile(2 / 7) == "alpha"
    assert sk.quantile(4 / 7) == "bravo"
    assert sk.quantile(1.0) == "foxtrot"
    assert sk.rank("bravo") == 4 / 7


def test_rejects_non_string_items_and_bad_images():
    sk = KllItemsSketch(200)
    sk.update_many([("a", 1), ("b", 2)])
    with pytest.raises(SketchesArgumentError):
        kll_items_to_reference_bytes(sk)
    with pytest.raises(SketchesArgumentError):
        kll_items_from_reference_bytes(b"\x05\x01")
    with pytest.raises(SketchesArgumentError):
        kll_items_from_reference_bytes(struct.pack("<BBBBHBB", 2, 1, 99, 1, 8, 8, 0))
    # truncated payload
    good = kll_items_to_reference_bytes(
        (lambda s: (s.update("hello"), s)[1])(KllItemsSketch(8))
    )
    with pytest.raises(SketchesArgumentError):
        kll_items_from_reference_bytes(good[:-2])
