"""Pure-stdlib PNG/WAV codecs (VERDICT r02 item 6): roundtrips over random
content covering every PNG filter type and gray/RGB/RGBA, WAV 8/16-bit, and
the DecodeStage real-codec output against the closed-form fixture."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.codecs import decode_png, decode_wav, encode_png, encode_wav


class TestPng:
    @pytest.mark.parametrize("shape", [(7, 5), (16, 16), (3, 31)])
    def test_gray_roundtrip(self, shape):
        rng = np.random.default_rng(hash(shape) % 2**32)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    @pytest.mark.parametrize("nch", [3, 4])
    def test_color_roundtrip(self, nch):
        rng = np.random.default_rng(nch)
        img = rng.integers(0, 256, size=(11, 9, nch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    def test_all_filter_types_hit(self):
        # >= 5 rows ⟹ encoder used filters 0..4; roundtrip proves each
        # unfilter path reconstructs exactly
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(10, 40), dtype=np.uint8)
        buf = encode_png(img)
        assert np.array_equal(decode_png(buf), img)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_png(b"not a png at all")

    def test_single_pixel(self):
        img = np.array([[200]], dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


class TestWav:
    def test_mono16_roundtrip(self):
        rng = np.random.default_rng(1)
        s = rng.integers(-32768, 32768, size=1234, dtype=np.int16)
        out, rate = decode_wav(encode_wav(s, rate=8000))
        assert rate == 8000
        assert np.array_equal(out[:, 0], s)

    def test_stereo_roundtrip(self):
        rng = np.random.default_rng(2)
        s = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
        out, rate = decode_wav(encode_wav(s, rate=44100, channels=2))
        assert rate == 44100
        assert np.array_equal(out, s)

    def test_8bit_decode(self):
        # hand-build an 8-bit PCM file: unsigned bytes, midpoint 128
        import struct

        data = bytes([0, 128, 255, 64])
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        buf = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
        out, rate = decode_wav(buf)
        assert rate == 8000
        assert out[:, 0].tolist() == [(0 - 128) << 8, 0, (255 - 128) << 8, (64 - 128) << 8]

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_wav(b"RIFX....nope")


def test_decode_stage_matches_closed_form():
    """DecodeStage(codec=png|wav) over the real fixture must reproduce the
    closed-form geometry and value sums the DuckDB oracle computes."""
    from raydedup.multimodal import DecodeStage, synth_real_media_table

    tbl = synth_real_media_table(12)
    png_rows = tbl.filter(pa.compute.equal(tbl.column("format"), "png"))
    wav_rows = tbl.filter(pa.compute.equal(tbl.column("format"), "wav"))
    png_out = DecodeStage(codec="png")(png_rows)
    wav_out = DecodeStage(codec="wav")(wav_rows)
    for out in (png_out, wav_out):
        for r in out.to_pylist():
            i = r["media_id"]
            if i % 2 == 0:
                w, h = 16 + (i % 8), 8 + (i % 5) * 4
                assert (r["width"], r["height"], r["duration_ms"]) == (w, h, 0)
                assert r["n_values"] == w * h
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                assert r["sum_value"] == int(((x * 3 + y * 5 + i) % 256).sum())
            else:
                frames = 800 + 16 * i
                assert (r["width"], r["height"]) == (0, 0)
                assert r["duration_ms"] == frames // 8
                t = np.arange(frames, dtype=np.int64)
                assert r["sum_value"] == int((((t * 7 + i * 13) % 2001) - 1000).sum())


def test_video_codec_still_stubbed():
    from raydedup.multimodal import DecodeStage

    with pytest.raises(NotImplementedError):
        DecodeStage(codec="h264")


def test_resize_stage_matches_numpy_and_passes_through():
    """ResizeStage: nearest-neighbor floor map matches direct numpy
    indexing after a full encode→decode round trip; non-PNG rows pass
    through unchanged with resized=false."""
    import pyarrow as pa

    from raydedup import codecs
    from raydedup.multimodal import ResizeStage, synth_real_media_table

    media = synth_real_media_table(12)
    stage = ResizeStage(out_w=5, out_h=3)
    out = stage(media)
    fmts = media.column("format").to_pylist()
    for row in range(media.num_rows):
        p_in = media.column("payload")[row].as_py()
        p_out = out.column("payload")[row].as_py()
        if fmts[row] != "png":
            assert p_out == p_in
            assert not out.column("resized")[row].as_py()
            continue
        img = codecs.decode_png(p_in)
        h, w = img.shape[:2]
        yi = (np.arange(3) * h) // 3
        xi = (np.arange(5) * w) // 5
        want = img[yi][:, xi]
        got = codecs.decode_png(p_out)
        np.testing.assert_array_equal(got, want)
        assert out.column("width")[row].as_py() == 5
        assert out.column("height")[row].as_py() == 3
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        ResizeStage(codec="wav")
    with _pytest.raises(ValueError):
        ResizeStage(out_w=0)


def test_audio_window_stage_matches_numpy():
    """AudioWindowStage vs direct numpy windowing, incl. stereo (frames
    counted per frame, sums across channels), trailing partial window,
    non-WAV passthrough skip, and validation."""
    import pyarrow as pa

    from raydedup import codecs
    from raydedup.multimodal import MEDIA_SCHEMA, AudioWindowStage

    rng = np.random.default_rng(6)
    mono = rng.integers(-3000, 3000, 1950).astype(np.int16)          # 2 full + partial
    stereo = rng.integers(-3000, 3000, (801, 2)).astype(np.int16)    # partial 2nd window
    rows = {
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["audio", "audio", "image"]),
        "format": pa.array(["wav", "wav", "png"]),
        "payload": pa.array(
            [codecs.encode_wav(mono, rate=8000),
             codecs.encode_wav(stereo, rate=8000, channels=2),
             b"not a png"], pa.large_binary()),
        "width": pa.array([0, 0, 0], pa.int32()),
        "height": pa.array([0, 0, 0], pa.int32()),
        "duration_ms": pa.array([0, 0, 0], pa.int32()),
    }
    out = AudioWindowStage(window_ms=100)(pa.table(rows, schema=MEDIA_SCHEMA))
    df = out.to_pandas()
    m = df[df.media_id == 1]
    assert list(m.n_samples) == [800, 800, 350]
    for w in range(3):
        assert m.iloc[w].sum_value == mono[w * 800:(w + 1) * 800].sum()
    s = df[df.media_id == 2]
    assert list(s.n_samples) == [1600, 2]  # per-frame windows, both channels
    assert s.iloc[0].sum_value == stereo[:800].sum()
    assert s.iloc[1].sum_value == stereo[800:].sum()
    assert 3 not in set(df.media_id)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        AudioWindowStage(codec="mp3")
    with _pytest.raises(ValueError):
        AudioWindowStage(window_ms=0)
