"""Pure-stdlib media codecs: PNG (zlib inflate + unfilter) and WAV (RIFF).

No media libraries exist in this environment, but both formats are fully
decodable with ``zlib``/``struct``/numpy — so the multimodal DecodeStage can
run a REAL decode (raydedup/multimodal.py), not a stub. Scope (documented):

* PNG — bit depth 8, color types 0 (gray) / 2 (RGB) / 6 (RGBA), no
  interlace; all five filter types decoded. Sub (1) unfilters with one
  cumsum-mod-256 pass; Average (3) and Paeth (4) carry a left-pixel
  recurrence, so those rows pay a per-pixel loop — acceptable because
  decode is an actor-pool stage over small batches, and rows choose their
  own filters anyway.
* WAV — RIFF/PCM, 8- or 16-bit, any channel count/rate.

The encoders exist to build deterministic fixtures (the encoder cycles all
five PNG filter types so the decoder's unfilter paths are exercised by the
oracle fixture, not just unit tests).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CT_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over int16 arrays."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 image (h,w) gray / (h,w,3) RGB / (h,w,4) RGBA → PNG bytes.
    Row y uses filter type y % 5, deliberately covering every filter."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ct = 0
        data = img[:, :, None]
    elif img.shape[2] == 3:
        ct = 2
        data = img
    elif img.shape[2] == 4:
        ct = 6
        data = img
    else:
        raise ValueError("expected gray/RGB/RGBA uint8")
    h, w, nch = data.shape
    raw = bytearray()
    prev = np.zeros((w, nch), dtype=np.int16)
    for y in range(h):
        row = data[y].astype(np.int16)
        left = np.vstack([np.zeros((1, nch), np.int16), row[:-1]])
        ul = np.vstack([np.zeros((1, nch), np.int16), prev[:-1]])
        ftype = y % 5
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - ((left + prev) >> 1)
        else:
            filt = row - _paeth(left, prev, ul)
        raw.append(ftype)
        raw += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h,w) for gray, (h,w,nch) otherwise."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = ct = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bd, ct, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if bd != 8 or ct not in _CT_CHANNELS or inter != 0 or comp != 0:
                raise NotImplementedError(
                    f"PNG variant not supported (depth={bd} color={ct} interlace={inter})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    nch = _CT_CHANNELS[ct]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, w, nch), dtype=np.uint8)
    prev = np.zeros((w, nch), dtype=np.int16)
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        frow = (
            np.frombuffer(raw, np.uint8, stride, base + 1)
            .reshape(w, nch)
            .astype(np.int16)
        )
        if ftype == 0:
            rec = frow
        elif ftype == 1:
            # sub: recon[x] = filt[x] + recon[x-1] → cumsum mod 256
            rec = np.cumsum(frow, axis=0, dtype=np.int64) & 0xFF
            rec = rec.astype(np.int16)
        elif ftype == 2:
            rec = (frow + prev) & 0xFF
        elif ftype in (3, 4):
            # left-pixel recurrence — per-pixel loop (see module docstring)
            rec = np.empty_like(frow)
            left = np.zeros(nch, dtype=np.int16)
            ulp = np.zeros(nch, dtype=np.int16)
            for x in range(w):
                if ftype == 3:
                    pred = (left + prev[x]) >> 1
                else:
                    pred = _paeth(left, prev[x], ulp)
                left = (frow[x] + pred) & 0xFF
                rec[x] = left
                ulp = prev[x]
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out[:, :, 0] if ct == 0 else out


def encode_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """int16 samples (frames,) or (frames, channels) → RIFF/PCM-16 bytes."""
    s = np.asarray(samples, dtype="<i2").reshape(-1, channels)
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM bytes → (samples (frames, channels) int16-range, rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits not in (8, 16):
                raise NotImplementedError(f"WAV fmt={audio_fmt} bits={bits}")
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.int16)
    else:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    frames = len(s) // channels
    return s[: frames * channels].reshape(frames, channels), rate


# ---------------------------------------------------------------------------
# PNG-stack "video" container: magic + frame index + concatenated PNG frames
# ---------------------------------------------------------------------------

PSTK_MAGIC = b"PSTK"


def encode_pngstack(frames: "list[np.ndarray]", interval_ms: int) -> bytes:
    """A minimal multi-frame container for the video plumbing: ``PSTK`` +
    u32 frame_count + u32 interval_ms, then per frame u32 length + a REAL
    PNG image (encode_png). Production stacks use a proper codec
    (ffmpeg/H.264 — not implementable from the stdlib); this container
    keeps every Ray-side property that matters — an indexed payload where
    frame sampling can decode ONLY the sampled frames — with a real
    per-frame codec chain."""
    import struct

    parts = [PSTK_MAGIC, struct.pack("<II", len(frames), interval_ms)]
    for f in frames:
        png = encode_png(f)
        parts.append(struct.pack("<I", len(png)))
        parts.append(png)
    return b"".join(parts)


def pngstack_index(buf: bytes) -> "tuple[int, list[tuple[int, int]]]":
    """(interval_ms, [(offset, length)] per frame) — parses ONLY the index
    walk, no frame decode."""
    import struct

    if buf[:4] != PSTK_MAGIC:
        raise ValueError("not a PSTK payload")
    if len(buf) < 12:
        raise ValueError("truncated PSTK header")
    n, interval_ms = struct.unpack_from("<II", buf, 4)
    off = 12
    idx = []
    for _ in range(n):
        if off + 4 > len(buf):
            raise ValueError("truncated PSTK frame index")
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        if off + ln > len(buf):
            raise ValueError("truncated PSTK frame body")
        idx.append((off, ln))
        off += ln
    if off != len(buf):
        raise ValueError("trailing bytes in PSTK payload")
    return interval_ms, idx


def decode_pngstack_frame(buf: bytes, entry: "tuple[int, int]") -> "np.ndarray":
    off, ln = entry
    return decode_png(buf[off : off + ln])
