"""Golden tests for the pure-Python media codecs + feature extractors
(functions/codecs.py) — the decode behind mm01/extract_features."""

from __future__ import annotations

import numpy as np
import pytest

from geosparql_etl_spark.functions.codecs import (
    audio_features,
    decode_bmp,
    decode_image,
    decode_wav,
    encode_bmp,
    encode_wav,
    image_features,
)


def test_bmp_roundtrip_with_row_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the stride path
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


def test_bmp_top_down_negative_height():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    data = bytearray(encode_bmp(px))
    # flip height sign (offset 14+4=18, i32) and reorder rows top-down
    h = int.from_bytes(data[22:26], "little", signed=True)
    data[22:26] = (-h).to_bytes(4, "little", signed=True)
    stride = 8  # 2 px * 3 B = 6 -> padded to 8
    rows = [bytes(data[54 + i * stride : 54 + (i + 1) * stride]) for i in range(2)]
    data[54:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(data)) == px).all()


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"payload-1")
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(px)[:-5])


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    rate, got = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and (got[:, 0] == mono).all()
    stereo = np.stack([mono, -mono], axis=1)
    rate, got = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and got.shape == (400, 2) and (got == stereo).all()


def test_image_features_golden_solid_color():
    """Exact expected statistics for a solid-color image."""
    px = np.full((4, 8, 3), 0, dtype=np.uint8)
    px[..., 0] = 255  # pure red
    f = image_features(px)
    assert len(f) == 16
    assert f[0] == 8.0 and f[1] == 4.0  # w, h
    assert f[2:5].tolist() == [1.0, 0.0, 0.0]  # channel means
    assert f[5:8].tolist() == [0.0, 0.0, 0.0]  # channel stds
    assert f[8] == pytest.approx(85 / 255)  # gray mean
    assert f[9] == 0.0
    hist = f[10:16]
    # gray=85.0 with edges stretched by the +1e-4 range pad -> bin 1
    assert hist[1] == 1.0 and hist.sum() == 1.0

def test_audio_features_golden_silence_and_square():
    silence = np.zeros(100, dtype=np.int16)
    f = audio_features(16000, silence[:, None])
    assert f[:3].tolist() == [1.0, 16000.0, 100.0]
    assert f[3:8].tolist() == [0.0, 0.0, 0.0, 0.0, 0.0]
    assert f[8] == 1.0  # all samples in the first |amp| bin

    square = np.tile([16384, -16384], 50).astype(np.int16)
    f2 = audio_features(8000, square[:, None])
    assert f2[5] == pytest.approx(0.5)  # RMS of +-0.5 square
    assert f2[6] == pytest.approx(1.0)  # zero crossing every step


def test_decode_image_prefers_pil_when_absent_falls_back(monkeypatch):
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert (decode_image(encode_bmp(px)) == px).all()


from geosparql_etl_spark.functions import codecs


def test_png_roundtrip_all_filter_types():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    for ft in range(5):
        out = codecs.decode_png(codecs.encode_png(img, filter_type=ft))
        assert (out == img).all(), f"filter {ft}"


def test_png_rgba_alpha_dropped():
    # hand-build a color-type-6 (RGBA) PNG: same chunk layout, 4 bpp
    import struct
    import zlib

    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., :3] = [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]]
    rgba[..., 3] = 255
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    data = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(raw))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert (codecs.decode_png(data) == rgba[..., :3]).all()


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = codecs.encode_png(img)
    with pytest.raises(ValueError):
        codecs.decode_png(good[:30])  # truncated: no IDAT/IEND


def test_decode_image_sniffs_png_and_bmp():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert (codecs.decode_image(codecs.encode_png(img)) == img).all()
    assert (codecs.decode_image(codecs.encode_bmp(img)) == img).all()
