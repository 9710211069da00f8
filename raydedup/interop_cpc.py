"""CPC sketch wire-format interop (compressed SerVer-1 images).

Reads and writes the reference CPC serialized format so sketches can be
exchanged with the Java/C++ DataSketches ecosystems:

* preamble: the 8 formats of ``cpc/PreambleUtil.java:37-130`` (2/4/6/8/10
  pre-ints; flags byte carries the format ordinal at bits 2-4 plus the
  compressed flag; seed-hash handshake as in ``interop.compute_seed_hash``);
* payload: the CPC entropy coding of ``cpc/CpcCompression.java`` — per-flavor
  decomposition (sparse pairs / hybrid merged pairs / pinned window+pairs /
  sliding window with phase-permuted pair columns), 12-bit-lookahead
  length-limited Huffman codes for window bytes, and interleaved
  (Huffman xDelta, unary Golomb-hi, base-bits Golomb-lo) codes for the
  surprising-value pairs. Code tables are the public format constants packed
  in ``_cpc_tables.py``; decoding tables are derived here as exact inverses
  (``CompressionData.makeDecodingTable`` semantics).

The uncompressed state maps onto :class:`raydedup.sketches.cpc.CpcSketch`'s
k x 64 coupon bit matrix via the default-row/XOR rule of
``cpc/CpcUtil.bitMatrixOfSketch`` (early zone below the window offset reads
as ones; pair entries flip bits). Conformance: the reference's own golden
images (``src/test/resources/cpc-{empty,sparse,hybrid,pinned,sliding,10m}.sk``,
asserted flavor + estimate as in ``cpc/CpcCBinariesTest.java:40-160``) plus
byte-identical re-serialization.
"""

from __future__ import annotations

import struct

import numpy as np

from ._cpc_tables import (
    COLUMN_PERMUTATIONS_FOR_ENCODING,
    ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE,
    LENGTH_LIMITED_UNARY_ENCODING_TABLE_65,
)
from .interop import DEFAULT_UPDATE_SEED, compute_seed_hash
from .sketches.cpc import CpcSketch

CPC_FAMILY_ID = 16
CPC_SER_VER = 1
_COMPRESSED_FLAG = 2
_PRE_INTS = (2, 2, 4, 8, 4, 8, 6, 10)  # per format ordinal

_FLAVOR_EMPTY, _FLAVOR_SPARSE, _FLAVOR_HYBRID, _FLAVOR_PINNED, _FLAVOR_SLIDING = range(5)
FLAVOR_NAMES = ("EMPTY", "SPARSE", "HYBRID", "PINNED", "SLIDING")


class CpcFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# derived decoding tables (exact inverses of the encoding tables)

def _make_decoding_table(encoding: np.ndarray, num_byte_values: int) -> np.ndarray:
    dec = np.zeros(4096, dtype=np.uint16)
    for byte_value in range(num_byte_values):
        entry = int(encoding[byte_value])
        code_val = entry & 0xFFF
        code_len = entry >> 12
        decoding_entry = (code_len << 8) | byte_value
        for garbage in range(1 << (12 - code_len)):
            dec[(code_val | (garbage << code_len)) & 0xFFF] = decoding_entry
    return dec


_DECODING_TABLES = [
    _make_decoding_table(ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[i], 256) for i in range(22)
]
_UNARY_DECODING_65 = _make_decoding_table(LENGTH_LIMITED_UNARY_ENCODING_TABLE_65, 65)
_COLUMN_PERMUTATIONS_FOR_DECODING = np.argsort(
    COLUMN_PERMUTATIONS_FOR_ENCODING, axis=1
).astype(np.uint8)


# ---------------------------------------------------------------------------
# flavor / offset / phase rules (CpcUtil.java:40-131, CpcCompression.java:447-470)

def determine_flavor(lg_k: int, num_coupons: int) -> int:
    c, k = num_coupons, 1 << lg_k
    if c == 0:
        return _FLAVOR_EMPTY
    if (c << 5) < 3 * k:
        return _FLAVOR_SPARSE
    if (c << 1) < k:
        return _FLAVOR_HYBRID
    if (c << 3) < 27 * k:
        return _FLAVOR_PINNED
    return _FLAVOR_SLIDING


def determine_correct_offset(lg_k: int, num_coupons: int) -> int:
    tmp = (num_coupons << 3) - 19 * (1 << lg_k)  # 8C - 19K
    return 0 if tmp < 0 else tmp >> (lg_k + 3)


def _determine_pseudo_phase(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16 + 0
        if 10 * c < 11 * k:
            return 16 + 1
        if 100 * c < 132 * k:
            return 16 + 2
        if 3 * c < 5 * k:
            return 16 + 3
        if 1000 * c < 1965 * k:
            return 16 + 4
        if 1000 * c < 2275 * k:
            return 16 + 5
        return 6  # steady-state table employed before its actual phase
    return (c >> (lg_k - 4)) & 15


def _golomb_base_bits(k: int, count: int) -> int:
    quotient = (k - count) // count
    return 0 if quotient == 0 else quotient.bit_length() - 1


# ---------------------------------------------------------------------------
# low-level bit codecs (CpcCompression.java:42-246; 32-bit word streams)

def _compress_bytes(data: bytes, encoding: np.ndarray) -> np.ndarray:
    words: list[int] = []
    bitbuf = 0
    bufbits = 0
    for b in data:
        entry = int(encoding[b])
        bitbuf |= (entry & 0xFFF) << bufbits
        bufbits += entry >> 12
        if bufbits >= 32:
            words.append(bitbuf & 0xFFFFFFFF)
            bitbuf >>= 32
            bufbits -= 32
    bufbits += 11  # pad so the decoder's 12-bit peek cannot overrun
    if bufbits >= 32:
        words.append(bitbuf & 0xFFFFFFFF)
        bitbuf >>= 32
        bufbits -= 32
    if bufbits > 0:
        words.append(bitbuf & 0xFFFFFFFF)
    return np.array(words, dtype=np.uint32)


def _uncompress_bytes(n: int, decoding: np.ndarray, words: np.ndarray) -> bytes:
    out = bytearray(n)
    wi = 0
    bitbuf = 0
    bufbits = 0
    for i in range(n):
        if bufbits < 12:
            bitbuf |= int(words[wi]) << bufbits
            wi += 1
            bufbits += 32
        lookup = int(decoding[bitbuf & 0xFFF])
        code_len = lookup >> 8
        out[i] = lookup & 0xFF
        bitbuf >>= code_len
        bufbits -= code_len
    if wi > len(words):
        raise CpcFormatError("window stream overrun")
    return bytes(out)


def _compress_pairs(pairs: np.ndarray, base_bits: int) -> np.ndarray:
    words: list[int] = []
    bitbuf = 0
    bufbits = 0
    lo_mask = (1 << base_bits) - 1
    pred_row = 0
    pred_col = 0
    unary = LENGTH_LIMITED_UNARY_ENCODING_TABLE_65
    for row_col in pairs.tolist():
        row = row_col >> 6
        col = row_col & 63
        if row != pred_row:
            pred_col = 0
        y_delta = row - pred_row
        x_delta = col - pred_col
        pred_row = row
        pred_col = col + 1

        entry = int(unary[x_delta])
        bitbuf |= (entry & 0xFFF) << bufbits
        bufbits += entry >> 12
        if bufbits >= 32:
            words.append(bitbuf & 0xFFFFFFFF)
            bitbuf >>= 32
            bufbits -= 32

        # unary-coded golomb high part, 16 zeros at a time (writeUnary)
        remaining = y_delta >> base_bits
        while remaining >= 16:
            remaining -= 16
            bufbits += 16
            if bufbits >= 32:
                words.append(bitbuf & 0xFFFFFFFF)
                bitbuf >>= 32
                bufbits -= 32
        bitbuf |= (1 << remaining) << bufbits
        bufbits += 1 + remaining
        if bufbits >= 32:
            words.append(bitbuf & 0xFFFFFFFF)
            bitbuf >>= 32
            bufbits -= 32

        bitbuf |= (y_delta & lo_mask) << bufbits
        bufbits += base_bits
        if bufbits >= 32:
            words.append(bitbuf & 0xFFFFFFFF)
            bitbuf >>= 32
            bufbits -= 32

    bufbits += max(0, 10 - base_bits)  # pad for the decoder's 12-bit peek
    if bufbits >= 32:
        words.append(bitbuf & 0xFFFFFFFF)
        bitbuf >>= 32
        bufbits -= 32
    if bufbits > 0:
        words.append(bitbuf & 0xFFFFFFFF)
    return np.array(words, dtype=np.uint32)


def _uncompress_pairs(n_pairs: int, base_bits: int, words: np.ndarray) -> np.ndarray:
    pairs = np.empty(n_pairs, dtype=np.int64)
    wi = 0
    bitbuf = 0
    bufbits = 0
    lo_mask = (1 << base_bits) - 1
    pred_row = 0
    pred_col = 0
    dec = _UNARY_DECODING_65
    for i in range(n_pairs):
        if bufbits < 12:
            bitbuf |= int(words[wi]) << bufbits
            wi += 1
            bufbits += 32
        lookup = int(dec[bitbuf & 0xFFF])
        code_len = lookup >> 8
        x_delta = lookup & 0xFF
        bitbuf >>= code_len
        bufbits -= code_len

        # readUnary: 8-bit peeks counting trailing zeros
        golomb_hi = 0
        while True:
            if bufbits < 8:
                bitbuf |= int(words[wi]) << bufbits
                wi += 1
                bufbits += 32
            peek8 = bitbuf & 0xFF
            if peek8 == 0:
                golomb_hi += 8
                bufbits -= 8
                bitbuf >>= 8
                continue
            tz = (peek8 & -peek8).bit_length() - 1
            golomb_hi += tz
            bufbits -= 1 + tz
            bitbuf >>= 1 + tz
            break

        if bufbits < base_bits:
            bitbuf |= int(words[wi]) << bufbits
            wi += 1
            bufbits += 32
        y_delta = (golomb_hi << base_bits) | (bitbuf & lo_mask)
        bitbuf >>= base_bits
        bufbits -= base_bits

        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        pairs[i] = (row << 6) | col
        pred_row = row
        pred_col = col + 1
    if wi > len(words):
        raise CpcFormatError("pair stream overrun")
    return pairs


def _compress_sv(k: int, pairs: np.ndarray) -> np.ndarray:
    base_bits = _golomb_base_bits(k + len(pairs), len(pairs))
    return _compress_pairs(pairs, base_bits)


def _uncompress_sv(k: int, n_pairs: int, words: np.ndarray) -> np.ndarray:
    base_bits = _golomb_base_bits(k + n_pairs, n_pairs)
    return _uncompress_pairs(n_pairs, base_bits, words)


# ---------------------------------------------------------------------------
# reading

def cpc_from_reference_bytes(raw: bytes, seed: int = DEFAULT_UPDATE_SEED) -> CpcSketch:
    """Deserialize a reference CPC image into a coupon bit-matrix sketch."""
    if len(raw) < 8:
        raise CpcFormatError("buffer too small for CPC preamble")
    pre_ints, ser_ver, fam_id, lg_k, fi_col, flags = struct.unpack_from("<6B", raw, 0)
    (seed_hash,) = struct.unpack_from("<H", raw, 6)
    if ser_ver != CPC_SER_VER:
        raise CpcFormatError(f"unsupported CPC SerVer {ser_ver}")
    if fam_id != CPC_FAMILY_ID:
        raise CpcFormatError(f"not a CPC image (family {fam_id})")
    if not flags & _COMPRESSED_FLAG:
        raise CpcFormatError("uncompressed CPC images are not defined by the format")
    if seed_hash != compute_seed_hash(seed):
        raise CpcFormatError(f"seed hash mismatch: {seed_hash}")
    fmt = (flags >> 2) & 7
    if pre_ints != _PRE_INTS[fmt]:
        raise CpcFormatError(f"preInts {pre_ints} != {_PRE_INTS[fmt]} for format {fmt}")
    has_hip = bool(fmt & 1)
    has_sv = bool(fmt & 2)
    has_window = bool(fmt & 4)

    num_coupons = 0
    num_sv = 0
    sv_length = 0
    w_length = 0
    kxp = float(1 << lg_k)
    hip_accum = 0.0
    if fmt >= 2:
        (num_coupons,) = struct.unpack_from("<I", raw, 8)
    if fmt in (2, 3):  # sparse/hybrid: numSV == numCoupons
        num_sv = num_coupons
        (sv_length,) = struct.unpack_from("<I", raw, 12)
    elif fmt in (4, 5):
        (w_length,) = struct.unpack_from("<I", raw, 12)
    elif fmt in (6, 7):
        (num_sv,) = struct.unpack_from("<I", raw, 12)
        base = 16 if fmt == 6 else 32
        sv_length, w_length = struct.unpack_from("<2I", raw, base)
    if has_hip and fmt >= 2:
        kxp, hip_accum = struct.unpack_from("<2d", raw, 16)

    w_start = pre_ints * 4
    sv_start = (pre_ints + w_length) * 4
    need = (pre_ints + w_length + sv_length) * 4
    if len(raw) < need:
        raise CpcFormatError(f"buffer too small: {len(raw)} < {need}")
    cw_words = np.frombuffer(raw, dtype="<u4", count=w_length, offset=w_start)
    sv_words = np.frombuffer(raw, dtype="<u4", count=sv_length, offset=sv_start)
    if has_sv and sv_length == 0:
        raise CpcFormatError("svLengthInts cannot be zero when SV flag set")
    if has_window and w_length == 0:
        raise CpcFormatError("wLengthInts cannot be zero when window flag set")

    k = 1 << lg_k
    flavor = determine_flavor(lg_k, num_coupons)
    offset = determine_correct_offset(lg_k, num_coupons)
    window = None
    pairs = np.empty(0, dtype=np.int64)

    if flavor == _FLAVOR_SPARSE and num_sv > 0:
        pairs = _uncompress_sv(k, num_sv, sv_words)
    elif flavor == _FLAVOR_HYBRID:
        # some "pairs" are really window bits (col < 8) — split them out
        all_pairs = _uncompress_sv(k, num_sv, sv_words)
        cols = all_pairs & 63
        in_window = cols < 8
        wbytes = np.zeros(k, dtype=np.uint8)
        wp = all_pairs[in_window]
        np.bitwise_or.at(wbytes, wp >> 6, (1 << (wp & 63)).astype(np.uint8))
        window = wbytes.tobytes()
        pairs = all_pairs[~in_window]
    elif flavor in (_FLAVOR_PINNED, _FLAVOR_SLIDING):
        pseudo_phase = _determine_pseudo_phase(lg_k, num_coupons)
        window = _uncompress_bytes(k, _DECODING_TABLES[pseudo_phase], cw_words)
        if num_sv > 0:
            pairs = _uncompress_sv(k, num_sv, sv_words)
            if flavor == _FLAVOR_PINNED:
                pairs += 8  # undo the compressor's 8-column shift
            else:
                perm = _COLUMN_PERMUTATIONS_FOR_DECODING[pseudo_phase & 15]
                rows = pairs >> 6
                cols = perm[(pairs & 63).astype(np.intp)].astype(np.int64)
                cols = (cols + offset + 8) & 63
                pairs = (rows << 6) | cols

    # bitMatrixOfSketch: default early-zone ones, window band, XOR pair flips
    matrix = np.full(k, (1 << offset) - 1, dtype=np.uint64) if num_coupons else np.zeros(
        k, dtype=np.uint64
    )
    if window is not None:
        matrix |= np.frombuffer(window, dtype=np.uint8).astype(np.uint64) << np.uint64(offset)
    if len(pairs):
        np.bitwise_xor.at(
            matrix, (pairs >> 6).astype(np.intp), np.uint64(1) << (pairs & 63).astype(np.uint64)
        )

    sk = CpcSketch(lg_k)
    sk.matrix = matrix
    sk.fi_col = fi_col
    sk.merge_flag = not has_hip
    sk.kxp = kxp
    sk.hip_est_accum = hip_accum
    if sk.num_coupons != num_coupons:
        raise CpcFormatError(
            f"matrix bit count {sk.num_coupons} != stored numCoupons {num_coupons}"
        )
    return sk


def cpc_flavor(sk: CpcSketch) -> str:
    return FLAVOR_NAMES[determine_flavor(sk.lg_k, sk.num_coupons)]


# ---------------------------------------------------------------------------
# writing

def cpc_to_reference_bytes(sk: CpcSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize to the reference compressed image (byte-identical round-trip
    for images read by :func:`cpc_from_reference_bytes`)."""
    lg_k = sk.lg_k
    k = 1 << lg_k
    c = sk.num_coupons
    flavor = determine_flavor(lg_k, c)
    offset = determine_correct_offset(lg_k, c)
    merge_flag = getattr(sk, "merge_flag", True)
    fi_col = getattr(sk, "fi_col", 0)
    kxp = getattr(sk, "kxp", float(k))
    hip_accum = getattr(sk, "hip_est_accum", 0.0)

    sv_words = np.empty(0, dtype=np.uint32)
    cw_words = np.empty(0, dtype=np.uint32)
    num_sv = 0

    if flavor in (_FLAVOR_SPARSE, _FLAVOR_HYBRID):
        rows, cols = np.nonzero(
            (sk.matrix[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        )
        pairs = np.sort((rows.astype(np.int64) << 6) | cols.astype(np.int64))
        num_sv = len(pairs)
        sv_words = _compress_sv(k, pairs)
    elif flavor in (_FLAVOR_PINNED, _FLAVOR_SLIDING):
        window = ((sk.matrix >> np.uint64(offset)) & np.uint64(0xFF)).astype(np.uint8)
        pseudo_phase = _determine_pseudo_phase(lg_k, c)
        cw_words = _compress_bytes(
            window.tobytes(), ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[pseudo_phase]
        )
        # surprising values: zeros in the saturated early zone, ones above the window
        expected = np.full(k, (np.uint64(1) << np.uint64(offset)) - np.uint64(1), dtype=np.uint64)
        expected |= window.astype(np.uint64) << np.uint64(offset)
        diff = sk.matrix ^ expected
        rows, cols = np.nonzero((diff[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        rows = rows.astype(np.int64)
        cols = cols.astype(np.int64)
        if flavor == _FLAVOR_PINNED:
            if len(cols) and cols.min() < 8:
                raise CpcFormatError("pinned flavor cannot have pairs below column 8")
            pairs = np.sort((rows << 6) | (cols - 8))
        else:
            perm = COLUMN_PERMUTATIONS_FOR_ENCODING[pseudo_phase & 15]
            cols = perm[((cols + 56 - offset) & 63).astype(np.intp)].astype(np.int64)
            pairs = np.sort((rows << 6) | cols)
        num_sv = len(pairs)
        if num_sv:
            sv_words = _compress_sv(k, pairs)

    fmt = (4 if len(cw_words) else 0) | (2 if num_sv else 0) | (0 if merge_flag else 1)
    pre_ints = _PRE_INTS[fmt]
    flags = (fmt << 2) | _COMPRESSED_FLAG
    out = bytearray(4 * (pre_ints + len(sv_words) + len(cw_words)))
    struct.pack_into(
        "<6BH", out, 0, pre_ints, CPC_SER_VER, CPC_FAMILY_ID, lg_k,
        fi_col if fmt >= 4 else 0, flags, compute_seed_hash(seed),
    )
    if fmt >= 2:
        struct.pack_into("<I", out, 8, c)
    if fmt in (2, 3):
        struct.pack_into("<I", out, 12, len(sv_words))
    elif fmt in (4, 5):
        struct.pack_into("<I", out, 12, len(cw_words))
    elif fmt in (6, 7):
        struct.pack_into("<I", out, 12, num_sv)
        base = 16 if fmt == 6 else 32
        struct.pack_into("<2I", out, base, len(sv_words), len(cw_words))
    if fmt & 1 and fmt >= 2:
        struct.pack_into("<2d", out, 16, kxp, hip_accum)
    w_start = pre_ints * 4
    out[w_start : w_start + 4 * len(cw_words)] = cw_words.astype("<u4").tobytes()
    sv_start = w_start + 4 * len(cw_words)
    out[sv_start : sv_start + 4 * len(sv_words)] = sv_words.astype("<u4").tobytes()
    return bytes(out)
