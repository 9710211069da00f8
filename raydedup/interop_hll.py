"""HLL sketch wire-format interop (SerVer-1 images).

Reads every serialized HLL image shape the reference ecosystem produces —
CouponList / CouponHashSet / HllArray modes x HLL_4 / HLL_6 / HLL_8 target
types, compact or updatable (layouts documented in ``hll/PreambleUtil.java:
38-88``; coupon encoding ``(value << 26) | addr26`` from ``hll/HllUtil.java:
131-141``; HLL_4 nibble+exception scheme from ``hll/Hll4Update.java`` with
the AUX_TOKEN=15 overflow map; HLL_6 little-endian 6-bit packing from
``hll/Hll6Array.java:117-124``) — and writes HLL-mode images in any of the
three target types.

Compatibility scope (documented deviation): the exchange is at the
*register-state* level. Images read here can be merged with each other and
estimated (that is the cross-ecosystem use case: Java/C++ writers produce
per-partition HLLs, this engine unions them), and images written here are
readable by the reference. The engine's own :class:`HllSketch` update path
keeps full 64-bit hashes in its sparse tier for small-range exactness
instead of 32-bit coupons, so engine-built sketches use a different
item→register mapping than reference-built ones; merging the two kinds over
*overlapping* item streams is not meaningful (the same caveat does not
apply to theta interop, whose update mapping is bit-identical, nor to CPC
fed through ``update_hash_pairs`` / ``aggregates.cpc_distinct`` — both
murmur3 words, exactly CpcSketch.hashUpdate; only CpcSketch.update_hashes,
the engine-internal single-word convenience, deviates and says so).
There are no golden HLL binaries in the reference test resources, so
conformance here is layout-exact read/write + round-trip + cross-type
consistency tests rather than golden-file equality.
"""

from __future__ import annotations

import struct

import numpy as np

from .sketches.hll import HllSketch

HLL_FAMILY_ID = 7
HLL_SER_VER = 1

_EMPTY_FLAG = 4
_COMPACT_FLAG = 8
_OOO_FLAG = 16

_LIST_PREINTS = 2
_SET_PREINTS = 3
_HLL_PREINTS = 10

_KEY_BITS_26 = 26
_KEY_MASK_26 = (1 << 26) - 1
_AUX_TOKEN = 0xF

# HllUtil.LG_AUX_ARR_INTS (indexed by lgK; only 4..21 used)
_LG_AUX_ARR_INTS = (
    0, 2, 2, 2, 2, 2, 2, 3, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 11,
    12, 13, 14, 15, 16, 17, 18,
)

TGT_HLL_4, TGT_HLL_6, TGT_HLL_8 = 0, 1, 2
_TGT_NAMES = {"hll4": TGT_HLL_4, "hll6": TGT_HLL_6, "hll8": TGT_HLL_8}


class HllFormatError(ValueError):
    pass


def _unpack6(packed: np.ndarray, k: int) -> np.ndarray:
    """Little-endian 6-bit fields starting at bit slot*6 (Hll6Array.get6Bit)."""
    bits = np.unpackbits(packed, bitorder="little")
    need = k * 6
    bits = bits[:need].reshape(k, 6)
    weights = (1 << np.arange(6, dtype=np.uint16))
    return (bits.astype(np.uint16) * weights).sum(axis=1).astype(np.uint8)


def _pack6(values: np.ndarray) -> np.ndarray:
    k = len(values)
    bits = ((values[:, None].astype(np.uint16) >> np.arange(6, dtype=np.uint16)) & 1).astype(
        np.uint8
    )
    arr_bytes = (k * 3) // 4 + 1  # hll6ArrBytes (AbstractHllArray.java:215-218)
    out = np.packbits(bits.reshape(-1), bitorder="little")
    full = np.zeros(arr_bytes, dtype=np.uint8)
    full[: len(out)] = out[:arr_bytes]
    return full


def _regs_from_coupons(coupons: np.ndarray, lg_k: int) -> np.ndarray:
    regs = np.zeros(1 << lg_k, dtype=np.uint8)
    if len(coupons):
        slots = (coupons & np.uint32((1 << lg_k) - 1)).astype(np.intp)
        values = (coupons >> np.uint32(_KEY_BITS_26)).astype(np.uint8)
        np.maximum.at(regs, slots, values)
    return regs


def hll_from_reference_bytes(raw: bytes) -> HllSketch:
    """Deserialize any reference HLL image into a dense-register sketch."""
    if len(raw) < 8:
        raise HllFormatError("buffer too small for HLL preamble")
    pre_ints, ser_ver, fam_id, lg_k, lg_arr, flags, byte6, mode = struct.unpack_from("<8B", raw, 0)
    if ser_ver != HLL_SER_VER:
        raise HllFormatError(f"unsupported HLL SerVer {ser_ver}")
    if fam_id != HLL_FAMILY_ID:
        raise HllFormatError(f"not an HLL image (family {fam_id})")
    cur_mode = mode & 3
    tgt_type = (mode >> 2) & 3
    compact = bool(flags & _COMPACT_FLAG)
    empty = bool(flags & _EMPTY_FLAG)
    k = 1 << lg_k

    sk = HllSketch(lg_k)
    sk.sparse = None
    sk.out_of_order = bool(flags & _OOO_FLAG)
    sk.hip_accum = None

    if cur_mode == 0:  # LIST
        if pre_ints != _LIST_PREINTS:
            raise HllFormatError(f"LIST preInts {pre_ints} != {_LIST_PREINTS}")
        count = byte6
        n_ints = count if compact else (1 << lg_arr)
        coupons = np.frombuffer(raw, dtype="<u4", count=n_ints, offset=8)
        coupons = coupons[coupons != 0]
        if not empty and len(coupons) != count:
            raise HllFormatError(f"LIST count {count} != nonzero coupons {len(coupons)}")
        sk.regs = _regs_from_coupons(coupons, lg_k)
    elif cur_mode == 1:  # SET
        if pre_ints != _SET_PREINTS:
            raise HllFormatError(f"SET preInts {pre_ints} != {_SET_PREINTS}")
        (count,) = struct.unpack_from("<i", raw, 8)
        n_ints = count if compact else (1 << lg_arr)
        coupons = np.frombuffer(raw, dtype="<u4", count=n_ints, offset=12)
        coupons = coupons[coupons != 0]
        if len(coupons) != count:
            raise HllFormatError(f"SET count {count} != nonzero coupons {len(coupons)}")
        sk.regs = _regs_from_coupons(coupons, lg_k)
    elif cur_mode == 2:  # HLL
        if pre_ints != _HLL_PREINTS:
            raise HllFormatError(f"HLL preInts {pre_ints} != {_HLL_PREINTS}")
        hip, kxq0, kxq1 = struct.unpack_from("<3d", raw, 8)
        cur_min = byte6
        num_at_cur_min, aux_count = struct.unpack_from("<2i", raw, 32)
        if tgt_type == TGT_HLL_8:
            regs = np.frombuffer(raw, dtype=np.uint8, count=k, offset=40).copy()
        elif tgt_type == TGT_HLL_6:
            arr_bytes = (k * 3) // 4 + 1
            packed = np.frombuffer(raw, dtype=np.uint8, count=arr_bytes, offset=40)
            regs = _unpack6(packed, k)
        elif tgt_type == TGT_HLL_4:
            arr_bytes = k >> 1
            packed = np.frombuffer(raw, dtype=np.uint8, count=arr_bytes, offset=40)
            nibs = np.empty(k, dtype=np.uint8)
            nibs[0::2] = packed & 0xF
            nibs[1::2] = packed >> 4
            regs = nibs + np.uint8(cur_min)
            exc = nibs == _AUX_TOKEN
            aux_start = 40 + arr_bytes
            n_aux_ints = aux_count if compact else (
                (1 << lg_arr) if lg_arr else (1 << _LG_AUX_ARR_INTS[lg_k])
            )
            pairs = np.frombuffer(raw, dtype="<u4", count=n_aux_ints, offset=aux_start)
            pairs = pairs[pairs != 0]
            if len(pairs) != aux_count:
                raise HllFormatError(f"aux count {aux_count} != nonzero pairs {len(pairs)}")
            if np.count_nonzero(exc) != aux_count:
                raise HllFormatError("AUX_TOKEN nibbles do not match aux pair count")
            if aux_count:
                slots = (pairs & np.uint32(_KEY_MASK_26)).astype(np.intp)
                vals = (pairs >> np.uint32(_KEY_BITS_26)).astype(np.uint8)
                if not np.all(exc[slots]):
                    raise HllFormatError("aux pair for a non-exception slot")
                regs[slots] = vals
        else:
            raise HllFormatError(f"unknown tgtHllType {tgt_type}")
        sk.regs = regs
        sk.hip_accum = None if sk.out_of_order else hip
        if num_at_cur_min != int(np.count_nonzero(regs == cur_min)):
            raise HllFormatError("numAtCurMin inconsistent with register array")
    else:
        raise HllFormatError(f"unknown CurMode {cur_mode}")
    return sk


def hll_to_reference_bytes(sk: HllSketch, tgt: str = "hll8", compact: bool = True) -> bytes:
    """Serialize to a reference HLL-mode image of the given target type.

    Sparse-tier sketches are densified into registers first (the engine's
    sparse tier stores raw hashes, not reference coupons, so LIST/SET
    images are never emitted). A never-merged sketch writes its live
    hipAccum with the OUT_OF_ORDER flag clear, so reference readers use
    the HIP estimator exactly as they would for their own in-order state;
    merged register state sets the flag and writes hipAccum 0, sending
    readers to their composite estimator.
    """
    tgt_type = _TGT_NAMES[tgt]
    if sk.sparse is not None:
        dense = HllSketch.deserialize(sk.serialize())
        dense._densify()
        regs = dense.regs
        hip = dense.hip_accum
        ooo = dense.out_of_order or hip is None
    else:
        regs = sk.regs
        hip = sk.hip_accum
        ooo = sk.out_of_order or hip is None
    k = 1 << sk.lg_k
    if int(regs.max(initial=0)) > 63:
        raise HllFormatError("register value exceeds the 6-bit wire range")

    cur_min = int(regs.min()) if tgt_type == TGT_HLL_4 else 0
    num_at_cur_min = int(np.count_nonzero(regs == cur_min))
    two_pow = np.ldexp(1.0, -regs.astype(np.int64))
    kxq0 = float(two_pow[regs < 32].sum())
    kxq1 = float(two_pow[regs >= 32].sum())
    empty = bool((regs == 0).all())

    aux_pairs = np.empty(0, dtype=np.uint32)
    if tgt_type == TGT_HLL_8:
        body = regs.tobytes()
    elif tgt_type == TGT_HLL_6:
        body = _pack6(regs).tobytes()
    else:
        shifted = regs.astype(np.int64) - cur_min
        exc = shifted >= _AUX_TOKEN
        nibs = np.where(exc, _AUX_TOKEN, shifted).astype(np.uint8)
        packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
        body = packed.tobytes()
        slots = np.nonzero(exc)[0]
        aux_pairs = (regs[slots].astype(np.uint32) << np.uint32(_KEY_BITS_26)) | slots.astype(
            np.uint32
        )

    lg_aux = _LG_AUX_ARR_INTS[sk.lg_k]
    if tgt_type == TGT_HLL_4:
        aux_bytes = 4 * len(aux_pairs) if compact else (4 << lg_aux)
        if not compact and len(aux_pairs) > (1 << lg_aux) * 3 // 4:
            lg_aux = max(lg_aux, int(len(aux_pairs) * 4 // 3).bit_length())
            aux_bytes = 4 << lg_aux
    else:
        aux_bytes = 0

    out = bytearray(40 + len(body) + aux_bytes)
    flags = (
        (_OOO_FLAG if ooo else 0)
        | (_COMPACT_FLAG if compact else 0)
        | (_EMPTY_FLAG if empty else 0)
    )
    mode = 2 | (tgt_type << 2)
    struct.pack_into(
        "<8B", out, 0, _HLL_PREINTS, HLL_SER_VER, HLL_FAMILY_ID, sk.lg_k,
        lg_aux if tgt_type == TGT_HLL_4 else 0, flags, cur_min, mode,
    )
    struct.pack_into("<3d", out, 8, 0.0 if ooo else hip, kxq0, kxq1)
    struct.pack_into("<2i", out, 32, num_at_cur_min, len(aux_pairs))
    out[40 : 40 + len(body)] = body
    if tgt_type == TGT_HLL_4 and len(aux_pairs):
        aux_start = 40 + len(body)
        if compact:
            out[aux_start : aux_start + 4 * len(aux_pairs)] = aux_pairs.astype("<u4").tobytes()
        else:
            # open-addressing layout (HeapAuxHashMap): slot = low-26 key hashed
            # by the reference's find(); emit the simple variant the readers
            # accept — pairs placed at key & (arrInts-1) with linear probing.
            arr = np.zeros(1 << lg_aux, dtype=np.uint32)
            mask = (1 << lg_aux) - 1
            for p in aux_pairs.tolist():
                i = p & mask
                while arr[i] != 0:
                    i = (i + 1) & mask
                arr[i] = p
            out[aux_start : aux_start + len(arr) * 4] = arr.astype("<u4").tobytes()
    return bytes(out)
