"""Vectorized 64-bit hashing (xxHash64 + MurmurHash3-128) in pure numpy.

These are from-scratch implementations of the two public hash algorithms the
reference library builds on:

* xxHash64 — reference semantics per the public XXH64 spec; the reference
  library carries the same algorithm at
  ``src/main/java/org/apache/datasketches/hash/XxHash.java:44-57`` (it
  delegates to datasketches-memory). This is our engine's primary shingle /
  band hash (north_star: "XXH64-family hashing").
* MurmurHash3 x64 128-bit — public Austin Appleby algorithm; the reference's
  ingest hash (``hash/MurmurHash3.java:81-214``). Sketch-parity paths use
  ``murmur3_128(...)[0] >>> 1`` with seed 9001 exactly like
  ``theta/UpdateSketch.java:220-336``.

Everything here operates on numpy ``uint64`` arrays with wraparound
arithmetic; scalar helpers exist for tests and for hashing small unique-token
dictionaries.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

# xxHash64 primes (public spec constants)
_P1 = U64(0x9E3779B185EBCA87)
_P2 = U64(0xC2B2AE3D27D4EB4F)
_P3 = U64(0x165667B19E3779F9)
_P4 = U64(0x85EBCA77C2B2AE63)
_P5 = U64(0x27D4EB2F165667C5)

_MASK = U64(0xFFFFFFFFFFFFFFFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r64 = U64(r)
    return (x << r64) | (x >> U64(64 - r))


def _xxh_round(acc: np.ndarray, inp: np.ndarray) -> np.ndarray:
    acc = acc + inp * _P2
    acc = _rotl(acc, 31)
    return acc * _P1


def _xxh_merge_round(acc: np.ndarray, val: np.ndarray) -> np.ndarray:
    acc = acc ^ _xxh_round(np.zeros_like(val), val)
    return acc * _P1 + _P4


def _xxh_avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> U64(33))
    h = h * _P2
    h = h ^ (h >> U64(29))
    h = h * _P3
    h = h ^ (h >> U64(32))
    return h


def xxh64_u64s(words: np.ndarray, seed: int = 0) -> np.ndarray:
    """xxHash64 of fixed-width rows of little-endian u64 words.

    ``words``: shape (n, w) uint64 — each row is hashed as the 8*w-byte
    little-endian concatenation of its words. Fully vectorized; this is the
    shingle-hash kernel (a w-token shingle = w token-hash words) and the LSH
    band-hash kernel (an r-row band = r minhash words).
    """
    words = np.ascontiguousarray(words, dtype=np.uint64)
    if words.ndim == 1:
        words = words[:, None]
    n, w = words.shape
    total_len = U64(8 * w)
    seed64 = U64(seed & 0xFFFFFFFFFFFFFFFF)
    sd = int(seed64)
    if w >= 4:
        v1 = np.full(n, U64((sd + int(_P1) + int(_P2)) & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        v2 = np.full(n, U64((sd + int(_P2)) & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        v3 = np.full(n, seed64, dtype=np.uint64)
        v4 = np.full(n, U64((sd - int(_P1)) & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        i = 0
        while i + 4 <= w:
            v1 = _xxh_round(v1, words[:, i])
            v2 = _xxh_round(v2, words[:, i + 1])
            v3 = _xxh_round(v3, words[:, i + 2])
            v4 = _xxh_round(v4, words[:, i + 3])
            i += 4
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        h = _xxh_merge_round(h, v1)
        h = _xxh_merge_round(h, v2)
        h = _xxh_merge_round(h, v3)
        h = _xxh_merge_round(h, v4)
    else:
        h = np.full(n, U64((sd + int(_P5)) & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        i = 0
    h = h + total_len
    while i < w:
        h = h ^ _xxh_round(np.zeros(n, dtype=np.uint64), words[:, i])
        h = _rotl(h, 27) * _P1 + _P4
        i += 1
    return _xxh_avalanche(h)


def xxh64_bytes(data: bytes, seed: int = 0) -> int:
    """Scalar xxHash64 of a byte string (python ints, for tests/dict hashing)."""
    out = xxh64_bytes_many([data], seed)
    return int(out[0])


def xxh64_bytes_many(items: list[bytes] | np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized xxHash64 over variable-length byte strings.

    Accepts a list of ``bytes`` or a (flat_u8, offsets) padded layout built by
    :func:`xxh64_flat`. Internally pads to a (n, Lmax) uint8 matrix and runs
    masked vector steps, so cost is O(n * Lmax/8) vector ops.
    """
    n = len(items)
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    lmax = int(lens.max()) if n else 0
    pad = ((lmax + 31) // 32 + 1) * 32  # room for unaligned 8/4-byte gathers
    buf = np.zeros((n, pad), dtype=np.uint8)
    for i, b in enumerate(items):
        if len(b):
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return _xxh64_padded(buf, lens, seed)


def xxh64_flat(flat: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized xxHash64 over an Arrow-style (flat bytes, offsets) layout.

    ``flat``: uint8 array of concatenated strings; ``offsets``: int array of
    n+1 boundaries (e.g. from a pyarrow StringArray's buffers, zero-copy).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    lmax = int(lens.max()) if n else 0
    pad = ((lmax + 31) // 32 + 1) * 32
    buf = np.zeros((n, pad), dtype=np.uint8)
    # scatter each string row; vectorized via a single flat assignment.
    # Gather by absolute per-segment positions so sliced layouts
    # (offsets[0] != 0, flat = the full absolute buffer) work — mirroring
    # murmur3_128_flat's offset normalization
    total = int(lens.sum())
    row = np.repeat(np.arange(n), lens)
    seg_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    intra = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, lens)
    buf[row, intra] = flat[np.repeat(offsets[:-1], lens) + intra]
    return _xxh64_padded(buf, lens, seed)


def _gather_u64(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian u64 at per-row byte offset ``pos`` from padded buffer."""
    idx = pos[:, None] + np.arange(8)
    b = np.take_along_axis(buf, idx, axis=1).astype(np.uint64)
    shifts = (np.arange(8, dtype=np.uint64) * U64(8))[None, :]
    return (b << shifts).sum(axis=1, dtype=np.uint64)


def _gather_u32(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    idx = pos[:, None] + np.arange(4)
    b = np.take_along_axis(buf, idx, axis=1).astype(np.uint64)
    shifts = (np.arange(4, dtype=np.uint64) * U64(8))[None, :]
    return (b << shifts).sum(axis=1, dtype=np.uint64)


def _xxh64_padded(buf: np.ndarray, lens: np.ndarray, seed: int) -> np.ndarray:
    n = buf.shape[0]
    seed64 = U64(seed & 0xFFFFFFFFFFFFFFFF)
    sd = int(seed64)
    lens = lens.astype(np.int64)
    h = np.empty(n, dtype=np.uint64)

    long_mask = lens >= 32
    pos = np.zeros(n, dtype=np.int64)

    if long_mask.any():
        v1 = np.full(n, U64((sd + int(_P1) + int(_P2)) & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        v2 = np.full(n, U64((sd + int(_P2)) & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        v3 = np.full(n, seed64, dtype=np.uint64)
        v4 = np.full(n, U64((sd - int(_P1)) & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        remaining = lens.copy()
        while True:
            m = remaining >= 32
            if not m.any():
                break
            p = pos
            nv1 = _xxh_round(v1, _gather_u64(buf, p))
            nv2 = _xxh_round(v2, _gather_u64(buf, p + 8))
            nv3 = _xxh_round(v3, _gather_u64(buf, p + 16))
            nv4 = _xxh_round(v4, _gather_u64(buf, p + 24))
            v1 = np.where(m, nv1, v1)
            v2 = np.where(m, nv2, v2)
            v3 = np.where(m, nv3, v3)
            v4 = np.where(m, nv4, v4)
            pos = np.where(m, pos + 32, pos)
            remaining = np.where(m, remaining - 32, remaining)
        hl = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        hl = _xxh_merge_round(hl, v1)
        hl = _xxh_merge_round(hl, v2)
        hl = _xxh_merge_round(hl, v3)
        hl = _xxh_merge_round(hl, v4)
        h = np.where(long_mask, hl, U64((sd + int(_P5)) & 0xFFFFFFFFFFFFFFFF))
    else:
        h[:] = U64((sd + int(_P5)) & 0xFFFFFFFFFFFFFFFF)

    h = h + lens.astype(np.uint64)
    remaining = lens - pos

    # 8-byte tail chunks
    while True:
        m = remaining >= 8
        if not m.any():
            break
        k1 = _xxh_round(np.zeros(n, dtype=np.uint64), _gather_u64(buf, pos))
        nh = _rotl(h ^ k1, 27) * _P1 + _P4
        h = np.where(m, nh, h)
        pos = np.where(m, pos + 8, pos)
        remaining = np.where(m, remaining - 8, remaining)

    # one optional 4-byte chunk
    m = remaining >= 4
    if m.any():
        k = _gather_u32(buf, pos)
        nh = _rotl(h ^ (k * _P1), 23) * _P2 + _P3
        h = np.where(m, nh, h)
        pos = np.where(m, pos + 4, pos)
        remaining = np.where(m, remaining - 4, remaining)

    # trailing bytes
    while True:
        m = remaining >= 1
        if not m.any():
            break
        b = np.take_along_axis(buf, pos[:, None], axis=1)[:, 0].astype(np.uint64)
        nh = _rotl(h ^ (b * _P5), 11) * _P1
        h = np.where(m, nh, h)
        pos = np.where(m, pos + 1, pos)
        remaining = np.where(m, remaining - 1, remaining)

    return _xxh_avalanche(h)


# ---------------------------------------------------------------------------
# MurmurHash3 x64 128-bit (public Appleby algorithm; reference ingest hash,
# hash/MurmurHash3.java:81-214). We need it for theta-parity hashing of u64
# streams: hash = murmur3_128(long, seed=9001)[0] >>> 1 per
# theta/UpdateSketch.java:222.
# ---------------------------------------------------------------------------

_C1 = U64(0x87C37B91114253D5)
_C2 = U64(0x4CF5AD432745937F)


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> U64(33))
    k = k * U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> U64(33))
    k = k * U64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> U64(33))
    return k


def murmur3_128_u64s(words: np.ndarray, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """MurmurHash3 x64 128 over rows of little-endian u64 words, vectorized.

    ``words`` shape (n, w); each row hashed as its 8*w-byte LE image.
    Returns (h1, h2) uint64 arrays. Matches the reference's
    ``MurmurHash3.hash(long[], seed)`` for the same byte image
    (hash/MurmurHash3.java:94-134).
    """
    words = np.ascontiguousarray(words, dtype=np.uint64)
    if words.ndim == 1:
        words = words[:, None]
    n, w = words.shape
    seed64 = U64(seed & 0xFFFFFFFFFFFFFFFF)
    h1 = np.full(n, seed64, dtype=np.uint64)
    h2 = np.full(n, seed64, dtype=np.uint64)
    i = 0
    # body: 16-byte blocks = pairs of words
    while i + 2 <= w:
        k1 = words[:, i].copy()
        k2 = words[:, i + 1].copy()
        k1 = _rotl(k1 * _C1, 31) * _C2
        h1 = h1 ^ k1
        h1 = (_rotl(h1, 27) + h2) * U64(5) + U64(0x52DCE729)
        k2 = _rotl(k2 * _C2, 33) * _C1
        h2 = h2 ^ k2
        h2 = (_rotl(h2, 31) + h1) * U64(5) + U64(0x38495AB5)
        i += 2
    # tail: one trailing word (8 bytes)
    if i < w:
        k1 = words[:, i].copy()
        k1 = _rotl(k1 * _C1, 31) * _C2
        h1 = h1 ^ k1
    total = U64(8 * w)
    h1 = h1 ^ total
    h2 = h2 ^ total
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def murmur3_128_bytes(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar byte-accurate MurmurHash3 x64 128 (standard tail handling).

    Matches the reference's hash(byte[], seed) (hash/MurmurHash3.java:94-214)
    including remainder tails; used for string-datum parity and tests.
    """
    M = 0xFFFFFFFFFFFFFFFF
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & M

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & M
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & M
        k ^= k >> 33
        return k

    length = len(data)
    h1 = h2 = seed & M
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (rotl((k1 * c1) & M, 31) * c2) & M
        h1 ^= k1
        h1 = ((rotl(h1, 27) + h2) * 5 + 0x52DCE729) & M
        k2 = (rotl((k2 * c2) & M, 33) * c1) & M
        h2 ^= k2
        h2 = ((rotl(h2, 31) + h1) * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16 :]
    k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little") if tail else 0
    k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little") if len(tail) > 8 else 0
    if len(tail) > 8:
        k2 = (rotl((k2 * c2) & M, 33) * c1) & M
        h2 ^= k2
    if tail:
        k1 = (rotl((k1 * c1) & M, 31) * c2) & M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2


def murmur3_128_flat(
    flat: np.ndarray, offsets: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized byte-accurate MurmurHash3 x64 128 over an Arrow-style
    (flat bytes, offsets) layout — the batch form of
    :func:`murmur3_128_bytes` (tests assert parity). Masked vector steps
    over a padded (n, Lmax) buffer, O(n * Lmax/16) vector ops."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint64)
    lens = np.diff(offsets)
    lmax = int(lens.max()) if n else 0
    pad = ((lmax + 15) // 16 + 1) * 16
    buf = np.zeros((n, pad), dtype=np.uint8)
    offs = offsets - offsets[0]
    row = np.repeat(np.arange(n), lens)
    col = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(offs[:-1], lens)
    buf[row, col] = flat[offsets[0] : offsets[-1]]

    seed64 = U64(seed & 0xFFFFFFFFFFFFFFFF)
    h1 = np.full(n, seed64, dtype=np.uint64)
    h2 = np.full(n, seed64, dtype=np.uint64)
    pos = np.zeros(n, dtype=np.int64)
    remaining = lens.copy()
    # body: full 16-byte blocks
    while True:
        m = remaining >= 16
        if not m.any():
            break
        k1 = _gather_u64(buf, pos)
        k2 = _gather_u64(buf, pos + 8)
        k1 = _rotl(k1 * _C1, 31) * _C2
        nh1 = (_rotl(h1 ^ k1, 27) + h2) * U64(5) + U64(0x52DCE729)
        k2 = _rotl(k2 * _C2, 33) * _C1
        nh2 = (_rotl(h2 ^ k2, 31) + nh1) * U64(5) + U64(0x38495AB5)
        h1 = np.where(m, nh1, h1)
        h2 = np.where(m, nh2, h2)
        pos = np.where(m, pos + 16, pos)
        remaining = np.where(m, remaining - 16, remaining)

    # tail: 1..15 remaining bytes, zero-padded gathers are exact because the
    # padded buffer is zero beyond each row's length
    t = remaining  # in [0, 16)
    k1 = _gather_u64(buf, pos)
    k2 = _gather_u64(buf, pos + 8)
    # mask to the actual tail lengths
    nbits1 = np.minimum(t, 8) * 8
    nbits2 = np.maximum(t - 8, 0) * 8
    full = U64(0xFFFFFFFFFFFFFFFF)
    sh1 = np.minimum(nbits1, 63).astype(np.uint64)  # clamp: <<64 is undefined
    sh2 = np.minimum(nbits2, 63).astype(np.uint64)
    mask1 = np.where(nbits1 >= 64, full, (U64(1) << sh1) - U64(1))
    mask2 = np.where(nbits2 >= 64, full, (U64(1) << sh2) - U64(1))
    k1 &= mask1
    k2 &= mask2
    has2 = t > 8
    k2m = _rotl(k2 * _C2, 33) * _C1
    h2 = np.where(has2, h2 ^ k2m, h2)
    has1 = t > 0
    k1m = _rotl(k1 * _C1, 31) * _C2
    h1 = np.where(has1, h1 ^ k1m, h1)

    h1 = h1 ^ lens.astype(np.uint64)
    h2 = h2 ^ lens.astype(np.uint64)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


DEFAULT_UPDATE_SEED = 9001  # thetacommon/ThetaUtil.java:78


def theta_hash_u64s(values: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """Reference theta ingest hash of u64 datums: murmur3_128(v)[0] >>> 1.

    Mirrors theta/UpdateSketch.java:222 (`hash(data, seed)[0] >>> 1`); output
    is uniform in (0, 2^63); 0 is an illegal sentinel that callers drop
    (thetacommon/HashOperations.java:305-321).
    """
    h1, _ = murmur3_128_u64s(np.asarray(values, dtype=np.uint64)[:, None], seed)
    return h1 >> U64(1)


# MurmurHash3Adaptor-style post-ops (hash/MurmurHash3Adaptor.java:43-306):
# map a 64-bit hash into an int range or a uniform double in [0,1).


def hash_to_int_range(h: np.ndarray, n: int) -> np.ndarray:
    """Uniform int in [0, n) from a 64-bit hash (adaptor asInt/modulo)."""
    return (np.asarray(h, dtype=np.uint64) % np.uint64(n)).astype(np.int64)


def hash_to_double(h: np.ndarray) -> np.ndarray:
    """Uniform double in [0, 1) from the top 53 bits (adaptor asDouble)."""
    return (np.asarray(h, dtype=np.uint64) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — public-domain mix used to derive permutation
    constants and salts from indices (deterministic, stateless)."""
    x = np.asarray(x, dtype=np.uint64)
    x = x + U64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
    return z ^ (z >> U64(31))


_POLY_B = U64(0x9E3779B97F4A7C15)  # odd → invertible mod 2^64
_POLY_BINV = U64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def poly_rolling_hashes(flat_tokens: np.ndarray, k: int, seed: int) -> np.ndarray:
    """uint64 hash of EVERY k-element window of ``flat_tokens`` in O(T).

    Polynomial rolling hash mod 2^64 (h_i = Σ_j tok[i+j]·B^j, position-
    normalized by B^-i so equal windows hash equal anywhere in the
    stream), passed through a seed-folded splitmix64 finisher for uniform
    bits. Replaces xxh64 over a (T, k) strided window matrix — O(T·k) and
    a strided copy — in the WINNOW tier (13× at k=24 on 1M-token blocks;
    inputs are already xxh64 word hashes, and winnow fingerprints are
    equality-based candidates the substring verifier re-checks, so hash
    choice is perf-only there). Deliberately NOT used for shingles: the
    shingle hash feeds the MinHash/KMV estimators, and swapping it —
    though estimator-quality-neutral in expectation (measured: rmse
    0.0289 vs 0.0279 over 300 controlled trials) — redraws the
    deterministic detection lottery for threshold-boundary pairs, which
    moved the measured recall draw from 0.9969 to 0.9890 (BASELINE.md
    round-5). Requires ``len(flat_tokens) >= k``; caller masks cross-row
    windows."""
    flat_tokens = np.ascontiguousarray(flat_tokens, dtype=np.uint64)
    T = len(flat_tokens)
    m = T - k + 1
    with np.errstate(over="ignore"):
        cb = np.full(T, _POLY_B, dtype=np.uint64)
        cb[0] = U64(1)
        powb = np.multiply.accumulate(cb)  # B^i
        ci = np.full(m, _POLY_BINV, dtype=np.uint64)
        ci[0] = U64(1)
        binv = np.multiply.accumulate(ci)  # B^-i
        prefix = np.empty(T + 1, dtype=np.uint64)
        prefix[0] = U64(0)
        np.cumsum(flat_tokens * powb, out=prefix[1:])
        core = (prefix[k:] - prefix[:-k]) * binv
    seed_mix = splitmix64(np.array([U64(seed)], dtype=np.uint64))[0]
    return splitmix64(core ^ seed_mix)
