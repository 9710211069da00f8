"""Multimodal (image/audio/video) column plumbing — decode stubs.

Binary payloads travel as opaque ``large_binary`` cells with typed metadata
columns; decode / feature-extract stages are actor-pool map_batches classes
whose Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested, while the codec call itself is stubbed: the
container ships no image/audio libraries, so ``DecodeStage`` uses a
deterministic fake decoder by default and raises ``NotImplementedError``
when asked for a real codec.
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
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: media libraries are not available in this "
                "container; plug a real decoder here"
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._fake_features(p or b"") for p in payloads])
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float32()), self.FEATURE_DIM
                ),
            }
        )


class FrameSampleStage:
    """Video frame sampling stub: emits every_n 'frame' rows per payload
    with deterministic offsets — exercises the 1→N flat-map layout."""

    def __init__(self, every_ms: int = 1000, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError("no video codec in this container")
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        out_id, out_ts = [], []
        for i in range(len(ids)):
            # null duration_ms arrives as NaN (to_numpy float conversion),
            # never None — treat it as duration 0
            d = 0 if dur[i] is None or dur[i] != dur[i] else int(dur[i])
            ts = np.arange(0, max(d, 1), self.every_ms, dtype=np.int64)
            out_id.append(np.full(len(ts), ids[i], dtype=np.int64))
            out_ts.append(ts)
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(out_id) if out_id else []),
                "frame_ts_ms": pa.array(np.concatenate(out_ts) if out_ts else []),
            }
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
