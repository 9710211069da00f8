"""Multimodal (image/audio/video) column plumbing.

Binary payloads travel as opaque ``large_binary`` cells with typed metadata
columns; decode / feature-extract stages are actor-pool map_batches classes.
``DecodeStage`` supports REAL pure-stdlib codecs (``codec="png"|"wav"`` via
raydedup/codecs.py: zlib inflate + unfilter, RIFF/PCM parse) alongside the
deterministic ``"fake"`` byte-level features. Video is served by the
PNG-stack container (codecs.encode_pngstack: an indexed stack of real PNG
frames — a stand-in for ffmpeg, which is not implementable from the
stdlib): ``FrameSampleStage`` walks the index and decodes ONLY the sampled
frames. Real decodes emit the decoded geometry (width/height/duration) and
exact value sums, which is what lets ``media_features`` /
``video_frame_samples`` carry value-hash DuckDB oracles over closed-form
fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import xxh64_bytes

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("format", pa.string()),      # png | jpeg | wav | ...
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeStage:
    """Actor-pool decode: payload bytes → fixed-size feature vector.

    ``codec="fake"`` (default): deterministic feature = normalized byte
    histogram + moments, so tests exercise the full actor/batch path.
    Any other codec raises NotImplementedError (no media libs in container).

    Real-deployment notes (the part that matters at scale): decoding is
    CPU-heavy and allocation-heavy, so this runs as an actor pool
    (``map_batches(DecodeStage, concurrency=(n, m), batch_size=small)``)
    with the codec context built once per actor in ``__init__``; large
    payloads mean SMALL batch_size (payload_bytes * batch_size * concurrency
    must fit the worker heap).
    """

    FEATURE_DIM = 40

    def __init__(self, codec: str = "fake"):
        if codec not in ("fake", "png", "wav"):
            raise NotImplementedError(
                f"codec {codec!r}: only png/wav are decodable from the "
                "stdlib in this container (raydedup/codecs.py); video needs "
                "a real codec library"
            )
        self.codec = codec

    def _fake_features(self, payload: bytes) -> np.ndarray:
        b = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
        hist = np.bincount(b >> 3, minlength=32).astype(np.float64)
        hist /= max(hist.sum(), 1.0)
        moments = np.array(
            [
                b.mean() / 255.0,
                b.std() / 255.0,
                min(float(len(b)) / 4096.0, 1.0),  # clamped: must not dominate cosine
                float(xxh64_bytes(payload) % 1000) / 1000.0,
            ]
        )
        # content-hash projection: deterministic pseudo-random ±components
        # seeded by the payload digest — identical payloads collide exactly,
        # different payloads are near-orthogonal in these dims (stands in
        # for the discriminative part of a real learned feature)
        seed = xxh64_bytes(payload)
        rng = np.random.default_rng(seed)
        proj = rng.standard_normal(self.FEATURE_DIM - 36) * 0.2
        return np.concatenate([hist, moments, proj])

    def _real_decode(self, payload: bytes) -> tuple[int, int, int, int, int, np.ndarray]:
        """(width, height, duration_ms, n_values, sum_value, flat values)."""
        from . import codecs

        if self.codec == "png":
            img = codecs.decode_png(payload)
            h, w = img.shape[:2]
            flat = img.reshape(-1).astype(np.int64)
            return w, h, 0, int(flat.size), int(flat.sum()), flat
        samples, rate = codecs.decode_wav(payload)
        flat = samples.reshape(-1).astype(np.int64)
        dur = int(round(1000.0 * len(samples) / rate))
        return 0, 0, dur, int(flat.size), int(flat.sum()), flat

    def _real_features(self, flat: np.ndarray, lo: float, hi: float) -> np.ndarray:
        """Feature over DECODED values (not payload bytes): 32-bin histogram
        + moments + content-hash projection — identical decodes collide."""
        v = flat.astype(np.float64)
        hist, _ = np.histogram(v, bins=32, range=(lo, hi))
        hist = hist.astype(np.float64) / max(len(v), 1)
        span = hi - lo
        h = xxh64_bytes(flat.tobytes())  # one buffer copy + hash, reused
        moments = np.array(
            [
                (v.mean() - lo) / span if len(v) else 0.0,
                v.std() / span if len(v) else 0.0,
                min(float(len(v)) / 65536.0, 1.0),
                float(h % 1000) / 1000.0,
            ]
        )
        rng = np.random.default_rng(h)
        proj = rng.standard_normal(self.FEATURE_DIM - 36) * 0.2
        return np.concatenate([hist, moments, proj])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.codec == "fake":
            feats = np.stack([self._fake_features(p or b"") for p in payloads])
            return pa.table(
                {
                    "media_id": batch.column("media_id"),
                    "kind": batch.column("kind"),
                    "feature": pa.FixedSizeListArray.from_arrays(
                        pa.array(feats.reshape(-1), type=pa.float32()),
                        self.FEATURE_DIM,
                    ),
                }
            )
        lo, hi = (0.0, 256.0) if self.codec == "png" else (-32768.0, 32768.0)
        w_, h_, d_, n_, s_, feats = [], [], [], [], [], []
        for p in payloads:
            w, h, dur, n, sm, flat = self._real_decode(p or b"")
            w_.append(w)
            h_.append(h)
            d_.append(dur)
            n_.append(n)
            s_.append(sm)
            feats.append(self._real_features(flat, lo, hi))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "width": pa.array(w_, pa.int64()),
                "height": pa.array(h_, pa.int64()),
                "duration_ms": pa.array(d_, pa.int64()),
                "n_values": pa.array(n_, pa.int64()),
                "sum_value": pa.array(s_, pa.int64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.stack(feats).reshape(-1), type=pa.float32()),
                    self.FEATURE_DIM,
                ),
            }
        )


class ResizeStage:
    """REAL image-resize actor-pool stage (pure numpy, no media libs):
    decode PNG → nearest-neighbor resample to ``(out_w, out_h)`` → re-encode
    PNG. The source index is the integer floor map ``src = (dst * src_dim)
    // out_dim``, so the resampled grid is closed-form for the synthetic
    fixture and the resized image's features carry a value-hash DuckDB
    oracle (``media_resized_features``). Re-encoding goes through the full
    encode_png path — a broken encoder or decoder breaks the oracle.

    Same actor-pool deployment notes as :class:`DecodeStage`: build per
    actor, small batch_size for large payloads. Non-PNG rows pass through
    unchanged payloads with a ``resized=false`` flag.
    """

    def __init__(self, out_w: int = 8, out_h: int = 8, codec: str = "png"):
        if codec != "png":
            raise NotImplementedError(
                "only PNG resize is implementable from the stdlib here"
            )
        if out_w <= 0 or out_h <= 0:
            raise ValueError("output dims must be positive")
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from . import codecs

        fmts = batch.column("format").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_payload: list[bytes] = []
        out_w: list[int] = []
        out_h: list[int] = []
        resized: list[bool] = []
        yi = np.arange(self.out_h, dtype=np.int64)
        xi = np.arange(self.out_w, dtype=np.int64)
        for fmt, p in zip(fmts, payloads):
            if fmt != "png" or not p:
                out_payload.append(p or b"")
                out_w.append(0)
                out_h.append(0)
                resized.append(False)
                continue
            img = codecs.decode_png(p)
            h, w = img.shape[:2]
            r = img[(yi * h) // self.out_h][:, (xi * w) // self.out_w]
            out_payload.append(codecs.encode_png(r))
            out_w.append(self.out_w)
            out_h.append(self.out_h)
            resized.append(True)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "format": batch.column("format"),
                "payload": pa.array(out_payload, pa.large_binary()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "resized": pa.array(resized, pa.bool_()),
            }
        )


class AudioWindowStage:
    """REAL audio frame-sampling actor-pool stage: decode WAV (RIFF/PCM,
    raydedup/codecs.py) → split the sample stream into fixed
    ``window_ms`` windows → one output row per window with exact n_samples
    and value sum (the 1→N flat-map layout over real decodes; the trailing
    partial window is emitted). ``media_audio_windows`` value-hash-checks
    the windowing against per-window sums recomputed in SQL from media_id.
    Multi-channel WAVs window by FRAME (all channels of a frame land in the
    same window; sums cover every channel)."""

    def __init__(self, window_ms: int = 100, codec: str = "wav"):
        if codec != "wav":
            raise NotImplementedError(
                "only WAV windowing is implementable from the stdlib here"
            )
        if window_ms <= 0:
            raise ValueError("window_ms must be positive")
        self.window_ms = window_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        from . import codecs

        fmts = batch.column("format").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy()
        out_id: list[np.ndarray] = []
        out_win: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_sum: list[np.ndarray] = []
        for i, (fmt, p) in enumerate(zip(fmts, payloads)):
            if fmt != "wav" or not p:
                continue
            samples, rate = codecs.decode_wav(p)
            frames = samples.shape[0]
            if frames == 0:
                continue
            per_win = max((rate * self.window_ms) // 1000, 1)
            win = np.arange(frames, dtype=np.int64) // per_win
            vals = samples.reshape(frames, -1).astype(np.int64)
            nch = vals.shape[1]
            n_win = int(win[-1]) + 1
            out_id.append(np.full(n_win, ids[i], dtype=np.int64))
            out_win.append(np.arange(n_win, dtype=np.int64))
            out_n.append(np.bincount(win, minlength=n_win) * nch)
            out_sum.append(
                np.bincount(win, weights=vals.sum(axis=1), minlength=n_win).astype(
                    np.int64
                )
            )
        if not out_id:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "window_idx": pa.array([], pa.int64()),
                    "n_samples": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(out_id), pa.int64()),
                "window_idx": pa.array(np.concatenate(out_win), pa.int64()),
                "n_samples": pa.array(np.concatenate(out_n), pa.int64()),
                "sum_value": pa.array(np.concatenate(out_sum), pa.int64()),
            }
        )


class FrameSampleStage:
    """Video frame sampling, REAL for PNG-stack payloads: parse the
    container index (no full decode), decode ONLY every ``every_n``-th
    frame through the real PNG chain, and emit one row per sampled frame
    with its decoded geometry and exact pixel sum. That index-then-
    selective-decode shape is the property that matters at 100 TB: a
    sampler never pays for the frames it skips. ``codec="fake"`` keeps the
    old duration-derived 1→N layout stub for plumbing tests.

    Actor-pool stage: big payloads → SMALL batch_size; the codec path is
    chosen once per actor in __init__."""

    def __init__(self, every_n: int = 2, codec: str = "pngstack",
                 every_ms: int | None = None):
        if codec not in ("pngstack", "fake"):
            raise NotImplementedError(
                f"codec {codec!r}: pngstack is the stdlib-decodable video "
                "container (codecs.py); real deployments plug ffmpeg here"
            )
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        if every_ms is not None and codec != "fake":
            raise ValueError(
                "every_ms only applies to codec='fake'; pngstack sampling "
                "is every_n frames at the container's own interval"
            )
        self.codec = codec
        self.every_n = every_n
        self.every_ms = 1000 if every_ms is None else every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        if self.codec == "fake":
            dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
            out_id, out_ts = [], []
            for i in range(len(ids)):
                # null duration_ms arrives as NaN (to_numpy float
                # conversion), never None — treat it as duration 0
                d = 0 if dur[i] is None or dur[i] != dur[i] else int(dur[i])
                ts = np.arange(0, max(d, 1), self.every_ms, dtype=np.int64)
                out_id.append(np.full(len(ts), ids[i], dtype=np.int64))
                out_ts.append(ts)
            return pa.table(
                {
                    "media_id": pa.array(
                        np.concatenate(out_id) if out_id else [],
                        pa.int64(),
                    ),
                    "frame_ts_ms": pa.array(
                        np.concatenate(out_ts) if out_ts else [],
                        pa.int64(),
                    ),
                }
            )
        from .codecs import decode_pngstack_frame, pngstack_index

        payloads = batch.column("payload")
        o_id, o_fi, o_ts, o_w, o_h, o_sum = [], [], [], [], [], []
        for i in range(len(ids)):
            buf = payloads[i].as_py()
            if buf is None:
                continue  # null payload → no frames (schema permits nulls)
            interval_ms, idx = pngstack_index(buf)
            for fi in range(0, len(idx), self.every_n):
                img = decode_pngstack_frame(buf, idx[fi])
                o_id.append(int(ids[i]))
                o_fi.append(fi)
                o_ts.append(fi * interval_ms)
                o_h.append(img.shape[0])
                o_w.append(img.shape[1])
                o_sum.append(int(img.astype(np.int64).sum()))
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_fi, pa.int64()),
                "frame_ts_ms": pa.array(o_ts, pa.int64()),
                "width": pa.array(o_w, pa.int64()),
                "height": pa.array(o_h, pa.int64()),
                "pixel_sum": pa.array(o_sum, pa.int64()),
            }
        )


def synth_video_table(n: int = 48) -> pa.Table:
    """Deterministic PNG-stack video fixture with closed-form frame
    contents: video i has 4+(i%5) frames at 40 ms, each frame f a gray
    image of width 8+(i%6), height 8+(i%3)*4 with
    pixel(y, x) = (x*3 + y*5 + i + f*11) % 256 — the per-frame pixel sums
    are SQL-computable from (media_id, frame_idx) alone, through the REAL
    png encode/decode chain."""
    from . import codecs

    ids, kinds, fmts, payloads, widths, heights, durs = [], [], [], [], [], [], []
    for i in range(n):
        w, h = 8 + (i % 6), 8 + (i % 3) * 4
        frames = []
        for f in range(4 + (i % 5)):
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            frames.append(((x * 3 + y * 5 + i + f * 11) % 256).astype(np.uint8))
        ids.append(i)
        kinds.append("video")
        fmts.append("pngstack")
        payloads.append(codecs.encode_pngstack(frames, interval_ms=40))
        widths.append(w)
        heights.append(h)
        durs.append(len(frames) * 40)
    return pa.table(
        {
            "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "kind": pa.array(kinds),
            "format": pa.array(fmts),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(np.asarray(widths, dtype=np.int32)),
            "height": pa.array(np.asarray(heights, dtype=np.int32)),
            "duration_ms": pa.array(np.asarray(durs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_real_media_table(n: int = 48) -> pa.Table:
    """Deterministic REAL media fixture with closed-form contents, so the
    decoded geometry and value sums are SQL-computable from media_id alone:

    * even ids → gray PNG, width 16+(i%8), height 8+(i%5)*4,
      pixel(y,x) = (x*3 + y*5 + i) % 256 (encoder cycles all 5 filters);
    * odd ids → mono 16-bit 8 kHz WAV, 800+16*i frames (always /8 → exact
      duration_ms), sample(t) = ((t*7 + i*13) % 2001) - 1000.

    A decoder bug (wrong unfilter, wrong stride, wrong chunk walk) breaks
    the value-hash match; the payload bytes really are PNG/WAV."""
    from . import codecs

    ids, kinds, fmts, payloads, widths, heights, durs = [], [], [], [], [], [], []
    for i in range(n):
        ids.append(i)
        if i % 2 == 0:
            w, h = 16 + (i % 8), 8 + (i % 5) * 4
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            img = ((x * 3 + y * 5 + i) % 256).astype(np.uint8)
            payloads.append(codecs.encode_png(img))
            kinds.append("image")
            fmts.append("png")
            widths.append(w)
            heights.append(h)
            durs.append(0)
        else:
            frames = 800 + 16 * i
            t = np.arange(frames, dtype=np.int64)
            s = ((t * 7 + i * 13) % 2001 - 1000).astype(np.int16)
            payloads.append(codecs.encode_wav(s, rate=8000, channels=1))
            kinds.append("audio")
            fmts.append("wav")
            widths.append(0)
            heights.append(0)
            durs.append(frames // 8)
    return pa.table(
        {
            "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "kind": pa.array(kinds),
            "format": pa.array(fmts),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(np.asarray(widths, dtype=np.int32)),
            "height": pa.array(np.asarray(heights, dtype=np.int32)),
            "duration_ms": pa.array(np.asarray(durs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic fake media table for tests (no external data)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([kinds[i % 3] for i in range(n)]),
        "format": pa.array(["bin"] * n),
        "payload": pa.array(
            [rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes() for _ in range(n)],
            type=pa.large_binary(),
        ),
        "width": pa.array(rng.integers(16, 256, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 256, n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(0, 10000, n).astype(np.int32)),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
