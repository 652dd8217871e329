"""Real media codecs in pure stdlib + numpy — no PIL/ffmpeg required.

The container ships no image/audio libraries, but three production formats
are fully decodable with what IS here: PNG (zlib inflate + scanline
unfilter), uncompressed 24-bit BMP (fixed headers + numpy), and PCM WAV
(stdlib `wave`). These make the multimodal operators' decode step REAL for
those mimes; JPEG and MP4/video remain honestly stubbed behind the same
interface (multimodal.py) because their codecs genuinely need external
libraries.

All functions are deterministic and round-trip-tested
(decode(encode(x)) == x).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a valid PNG (color type 2, filter 0)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). `raw` = h rows of
    (1 filter byte + stride data bytes)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            line = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    line[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    line[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = line.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit RGB(A) PNG to (h, w, 3) uint8 (alpha dropped)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in (2, 6) or interlace:
                raise NotImplementedError(
                    "only 8-bit RGB/RGBA non-interlaced PNG supported"
                )
            ch = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    px = _unfilter(raw, h, w * ch, ch).reshape(h, w, ch)
    return np.ascontiguousarray(px[:, :, :3])


# ---------------------------------------------------------------- BMP

def encode_bmp(img: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as uncompressed 24-bit bottom-up BMP."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    pad = (-(w * 3)) % 4
    body = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    size = 14 + 40 + len(body)
    return (
        struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", payload[14:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return np.ascontiguousarray(px[::-1] if flip else px)


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode float32/float64 [-1, 1] mono samples as 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(samples, dtype="float64"), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV to (float64 mono samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n, rate, width, ch = f.getnframes(), f.getframerate(), f.getsampwidth(), f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        s = np.frombuffer(raw, dtype="<i2").astype("float64") / 32767.0
    elif width == 1:
        s = (np.frombuffer(raw, dtype="u1").astype("float64") - 128.0) / 127.0
    else:
        raise NotImplementedError("only 8/16-bit PCM WAV supported")
    if ch > 1:
        s = s.reshape(-1, ch).mean(axis=1)
    return s, rate


# ---------------------------------------------------------------- ops

def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resize to (w, h) — pure indexing."""
    tw, th = size
    h, w = img.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return np.ascontiguousarray(img[ys][:, xs])


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Real audio features: [rms, zero-crossing rate, spectral centroid,
    13 log-band energies], length `dim`, all in ~[0, 1]."""
    s = np.asarray(samples, dtype="float64")
    if len(s) == 0:
        return np.zeros(dim, dtype="float32")
    rms = float(np.sqrt(np.mean(s * s)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(s))
    freqs = np.fft.rfftfreq(len(s), d=1.0 / rate)
    centroid = float((spec * freqs).sum() / (spec.sum() + 1e-12) / (rate / 2))
    n_bands = dim - 3
    edges = np.linspace(0, len(spec), n_bands + 1, dtype=int)
    e = np.array([spec[a:b].sum() for a, b in zip(edges[:-1], edges[1:])])
    bands = np.log1p(e) / (np.log1p(e).max() + 1e-12)
    return np.concatenate([[rms, zcr, centroid], bands])[:dim].astype("float32")


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Mean-pool features: 4x4 grid luminance (13) + global RGB means."""
    h, w = img.shape[:2]
    ch, cw = max((h // 4) * 4, 4), max((w // 4) * 4, 4)
    img_c = resize_nearest(img, (cw, ch)) if (h < 4 or w < 4) else img[:ch, :cw]
    g = img_c.reshape(4, ch // 4, 4, cw // 4, 3).mean(axis=(1, 3)).mean(axis=2)
    vec = np.concatenate([g.ravel()[: dim - 3], img.mean(axis=(0, 1))]) / 255.0
    return vec[:dim].astype("float32")
