"""PNG-stack video container + FrameSampleStage: round-trip, selective
decode (skipped frames are never decoded), and sampled-feature parity with
direct per-frame decodes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _frames(i: int):
    w, h = 8 + (i % 6), 8 + (i % 3) * 4
    out = []
    for f in range(4 + (i % 5)):
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        out.append(((x * 3 + y * 5 + i + f * 11) % 256).astype(np.uint8))
    return out


def test_pngstack_roundtrip():
    from raydedup.codecs import (
        decode_pngstack_frame,
        encode_pngstack,
        pngstack_index,
    )

    frames = _frames(3)
    buf = encode_pngstack(frames, interval_ms=40)
    interval, idx = pngstack_index(buf)
    assert interval == 40 and len(idx) == len(frames)
    for f, entry in zip(frames, idx):
        assert np.array_equal(decode_pngstack_frame(buf, entry), f)
    import pytest

    with pytest.raises(ValueError):
        pngstack_index(b"JUNK" + buf[4:])
    with pytest.raises(ValueError):
        pngstack_index(buf + b"x")
    # truncation anywhere raises ValueError, not struct.error
    for cut in (6, 10, 14, len(buf) - 3):
        with pytest.raises(ValueError):
            pngstack_index(buf[:cut])


def test_frame_sample_stage_selective_decode(monkeypatch):
    """every_n sampling decodes EXACTLY the sampled frames — the index
    walk never pays for skipped ones."""
    import raydedup.codecs as codecs
    from raydedup.multimodal import FrameSampleStage, synth_video_table

    calls = {"n": 0}
    real = codecs.decode_png

    def counting(buf):
        calls["n"] += 1
        return real(buf)

    monkeypatch.setattr(codecs, "decode_png", counting)
    tbl = synth_video_table(12)
    out = FrameSampleStage(every_n=3, codec="pngstack")(tbl)
    expected_rows = sum(len(range(0, 4 + (i % 5), 3)) for i in range(12))
    assert out.num_rows == expected_rows
    assert calls["n"] == expected_rows  # one decode per SAMPLED frame only

    # feature parity with direct decodes
    for r in range(out.num_rows):
        i = out.column("media_id")[r].as_py()
        fi = out.column("frame_idx")[r].as_py()
        img = _frames(i)[fi]
        assert out.column("width")[r].as_py() == img.shape[1]
        assert out.column("height")[r].as_py() == img.shape[0]
        assert out.column("pixel_sum")[r].as_py() == int(
            img.astype(np.int64).sum()
        )
        assert out.column("frame_ts_ms")[r].as_py() == fi * 40


def test_frame_sample_fake_mode_layout():
    from raydedup.multimodal import FrameSampleStage

    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "duration_ms": pa.array([2500, None], pa.int32()),
        }
    )
    out = FrameSampleStage(every_ms=1000, codec="fake")(tbl)
    assert out.column("media_id").to_pylist() == [1, 1, 1, 2]
    assert out.column("frame_ts_ms").to_pylist() == [0, 1000, 2000, 0]
    # empty batch keeps the typed schema (int64, not null)
    empty = FrameSampleStage(codec="fake")(tbl.slice(0, 0))
    assert empty.schema.field("media_id").type == pa.int64()
    assert empty.schema.field("frame_ts_ms").type == pa.int64()


def test_frame_sample_guards():
    import pytest

    from raydedup.multimodal import FrameSampleStage, synth_video_table

    # every_ms applies only to fake mode
    with pytest.raises(ValueError):
        FrameSampleStage(every_ms=500)  # default codec is pngstack
    # null payload rows are skipped, not crashed on
    tbl = synth_video_table(2)
    with_null = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [tbl.column("payload")[0].as_py(), None], pa.large_binary()
            ),
        }
    )
    out = FrameSampleStage(every_n=1, codec="pngstack")(with_null)
    assert set(out.column("media_id").to_pylist()) == {0}
