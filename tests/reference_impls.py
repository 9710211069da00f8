"""Independent scalar reference implementations used only by tests.

These are written directly from the public algorithm specifications
(xxHash64 spec, Broder MinHash, KMV) with no code shared with the package —
agreement between these and the vectorized kernels is the conformance check
(the engine analog of the reference's golden-binary corpus,
src/test/resources/*.sk, loaded in e.g. T/cpc/CpcCBinariesTest.java:42-108).
"""

from __future__ import annotations

M64 = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    seed &= M64
    pos = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed
        v4 = (seed - P1) & M64
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while pos + 8 <= n:
        k1 = _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h ^ k1, 27) * P1 + P4) & M64
        pos += 8
    if pos + 4 <= n:
        k = int.from_bytes(data[pos : pos + 4], "little")
        h = (_rotl(h ^ ((k * P1) & M64), 23) * P2 + P3) & M64
        pos += 4
    while pos < n:
        h = (_rotl(h ^ ((data[pos] * P5) & M64), 11) * P1) & M64
        pos += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def shingle_set(tokens: list[str], k: int, seed: int) -> set[int]:
    """Reference shingle-hash set: xxh64 over LE-concat of token xxh64s."""
    th = [xxh64(t.encode(), seed) for t in tokens]
    if not th:
        return set()
    if len(th) < k:
        windows = [th]
    else:
        windows = [th[i : i + k] for i in range(len(th) - k + 1)]
    out = set()
    for w in windows:
        out.add(xxh64(b"".join(x.to_bytes(8, "little") for x in w), seed))
    return out


def exact_jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)
