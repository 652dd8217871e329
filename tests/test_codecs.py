"""Real-codec round trips (no Spark needed): PNG (all five scanline
filters), uncompressed 24-bit BMP (incl. stride padding), 16-bit PCM WAV,
nearest resize, and the audio feature extractor's physics."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from log_analysis_ai_spark import codecs


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (5, 7), (48, 64), (16, 3)])
def test_png_roundtrip(h, w):
    img = _img(h, w, seed=h * 100 + w)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filter_types(ftype):
    """Forward-filter an image with one filter type per scanline (the part
    our encoder never emits) and check the decoder inverts it."""
    img = _img(9, 6, seed=ftype)
    h, w = img.shape[:2]
    bpp, stride = 3, w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        cur = flat[y]
        out = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (cur[x] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(out.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(png), img)


def test_png_rgba_alpha_dropped():
    img = _img(4, 4, seed=9)
    rgba = np.dstack([img, np.full((4, 4), 200, dtype=np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(raw))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(png), img)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (48, 63)])  # odd widths: stride pad
def test_bmp_roundtrip(h, w):
    img = _img(h, w, seed=h * 7 + w)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_wav_roundtrip_within_quantization():
    t = np.arange(0, 800) / 16000.0
    s = 0.7 * np.sin(2 * np.pi * 440.0 * t)
    got, rate = codecs.decode_wav(codecs.encode_wav(s, 16000))
    assert rate == 16000 and len(got) == len(s)
    assert np.abs(got - s).max() < 1.5 / 32767


def test_resize_nearest():
    img = _img(40, 60, seed=3)
    out = codecs.resize_nearest(img, (15, 10))
    assert out.shape == (10, 15, 3)
    assert np.array_equal(codecs.resize_nearest(img, (60, 40)), img)  # identity


def test_audio_features_centroid_tracks_pitch():
    t = np.arange(0, 16000) / 16000.0
    lo = codecs.audio_features(np.sin(2 * np.pi * 200 * t), 16000)
    hi = codecs.audio_features(np.sin(2 * np.pi * 3000 * t), 16000)
    assert lo.shape == (16,) and hi.shape == (16,)
    # centroid (index 2) normalized by Nyquist: 200/8000 vs 3000/8000
    assert abs(lo[2] - 200 / 8000) < 0.01
    assert abs(hi[2] - 3000 / 8000) < 0.01
    # pure tones: zero-crossing rate scales with frequency
    assert hi[1] > lo[1]
