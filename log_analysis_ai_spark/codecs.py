"""Real media codecs in pure stdlib + numpy — no PIL/ffmpeg required.

The container ships no image/audio libraries, but four production formats
are decodable with what IS here: PNG (zlib inflate + scanline unfilter),
uncompressed 24-bit BMP (fixed headers + numpy), PCM WAV (stdlib `wave`),
and JPEG (full from-scratch implementation below — encode baseline 4:4:4,
baseline 4:2:0 AND progressive 4:2:0; decode baseline 4:4:4 / 4:2:2 /
4:2:0 / grayscale AND progressive incl. subsampled chroma, with restart
intervals; validated against externally produced libjpeg files plus
transcode equality between the baseline and progressive 4:2:0 paths over
identical coefficients). These make the multimodal operators' decode step
REAL for those mimes; arithmetic coding, 12-bit, CMYK and MP4/video remain
honestly stubbed behind the same interface (multimodal.py) because those
genuinely need external libraries.

All functions are deterministic and round-trip-tested
(decode(encode(x)) == x; JPEG by PSNR — it is lossy).
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


# ---------------------------------------------------------------- JPEG
#
# Baseline sequential JFIF (SOF0), 8-bit, standard Annex-K quantization +
# Huffman tables, from the public JPEG spec (ITU-T T.81) — pure
# stdlib+numpy, no PIL. The encoder emits 4:4:4 (optionally with restart
# intervals) plus 4:2:0 baseline and progressive variants; the decoder
# additionally accepts 4:2:2 / 4:2:0 / grayscale (general interleaved-MCU
# geometry, replication chroma upsampling) and honors DRI/RSTn.
# Progressive (SOF2) decoding handles subsampled chroma too
# (_decode_progressive). NotImplementedError for the rest (arithmetic
# coding, 12-bit, CMYK, multi-scan non-interleaved baseline).

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (luminance, chrominance), natural order.
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 Huffman specs: (BITS counts per code length 1..16, HUFFVAL).
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical T.81 assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse of _huff_codes."""
    return {(l, c): s for s, (c, l) in _huff_codes(bits, vals).items()}


_DCT = np.array([
    [np.sqrt((1.0 if k == 0 else 2.0) / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
     for n in range(8)]
    for k in range(8)
])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    tl = np.clip(np.floor((_QL * scale + 50.0) / 100.0), 1, 255)
    tc = np.clip(np.floor((_QC * scale + 50.0) / 100.0), 1, 255)
    return tl, tc


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.clip(np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1).round(), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s


def _mag_bits(v: int) -> tuple[int, int]:
    """(category size, magnitude code) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _blocks(chan: np.ndarray) -> np.ndarray:
    """(n_blocks_y, n_blocks_x, 8, 8) view of an 8-padded channel."""
    h, w = chan.shape
    return chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def encode_jpeg(img: np.ndarray, quality: int = 90, restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JFIF (SOF0, 4:4:4).
    `restart_interval` > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (predictors reset, stream byte-aligned) — the
    error-resilience feature most camera JPEGs use."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    tl, tc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(img)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    dc_tabs = (_huff_codes(*_DC_L), _huff_codes(*_DC_C))
    ac_tabs = (_huff_codes(*_AC_L), _huff_codes(*_AC_C))
    qts = (tl, tc, tc)
    comp_tab = (0, 1, 1)

    # DCT + quantize every block of every component up front (vectorized)
    quants = []
    for ci in range(3):
        blocks = _blocks(pad[..., ci] - 128.0)
        coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
        qt = qts[ci].reshape(8, 8)
        quants.append(np.round(coef / qt).astype(np.int64))

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_n = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()  # byte-align before the marker
                bw.out += bytes([0xFF, 0xD0 + (mcu_n // restart_interval - 1) % 8])
                pred = [0, 0, 0]
            mcu_n += 1
            for ci in range(3):  # 4:4:4 -> one block per component per MCU
                zz = quants[ci][by, bx].ravel()[_ZIGZAG]
                pred[ci] = _write_dc(bw, int(zz[0]), pred[ci], dc_tabs[comp_tab[ci]])
                _write_ac(bw, zz, ac_tabs[comp_tab[ci]])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table[_ZIGZAG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8" + app0 + dri + dqt(0, tl) + dqt(1, tc)
        + dht(0, 0, _DC_L) + dht(1, 0, _AC_L) + dht(0, 1, _DC_C) + dht(1, 1, _AC_C)
        + sof + sos + bytes(bw.out) + b"\xff\xd9"
    )


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _write_dc(bw: _BitWriter, v: int, pred: int, dc_t) -> int:
    """Huffman-code one DC difference; returns the new predictor."""
    size, mag = _mag_bits(v - pred)
    code, ln = dc_t[size]
    bw.put(code, ln)
    if size:
        bw.put(mag, size)
    return v


def _write_ac(bw: _BitWriter, zz: np.ndarray, ac_t, ss: int = 1, se: int = 63) -> None:
    """Huffman-code the AC band zz[ss..se] (run/size symbols, ZRL, EOB).
    Emitting plain EOB (0x00) is also a valid progressive EOBn with run
    length 1, so this serves baseline scans AND progressive
    spectral-selection first scans (T.81 G.1.2.2)."""
    run = 0
    nz = np.flatnonzero(zz[ss : se + 1])
    last = ss + nz[-1] if len(nz) else ss - 1
    for i in range(ss, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, mag = _mag_bits(v)
        code, ln = ac_t[(run << 4) | size]
        bw.put(code, ln)
        bw.put(mag, size)
        run = 0
    if last < se:
        code, ln = ac_t[0x00]  # EOB
        bw.put(code, ln)


def _coef_grids_420(img: np.ndarray, quality: int):
    """Quantized coefficient grids for 4:2:0: full-res Y, 2×2-mean
    subsampled Cb/Cr, each padded to the MCU grid (Y: 2·mcu blocks per
    axis, chroma: 1). Returns (quants, tl, tc, mcuy, mcux)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = img.shape[:2]
    tl, tc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(img).astype(np.float64)
    mcux, mcuy = -(-w // 16), -(-h // 16)
    ph, pw = mcuy * 16, mcux * 16
    pad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    chans = [
        (pad[..., 0], tl),
        (pad[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)), tc),
        (pad[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)), tc),
    ]
    quants = []
    for chan, qt in chans:
        blocks = _blocks(chan - 128.0)
        coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
        quants.append(np.round(coef / qt.reshape(8, 8)).astype(np.int64))
    return quants, tl, tc, mcuy, mcux


def _headers_420(h: int, w: int, tl, tc, sof_marker: int) -> bytes:
    """SOI…SOF prefix shared by the baseline and progressive 4:2:0 writers
    (sampling 2x2/1x1/1x1, quant+Huffman tables identical to encode_jpeg)."""
    def dqt(tid, table):
        return _seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table[_ZIGZAG]))

    def dht(cls, tid, spec):
        bits, vals = spec
        return _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    app0 = _seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    sof = _seg(sof_marker, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    return (
        b"\xff\xd8" + app0 + dqt(0, tl) + dqt(1, tc)
        + dht(0, 0, _DC_L) + dht(1, 0, _AC_L) + dht(0, 1, _DC_C) + dht(1, 1, _AC_C)
        + sof
    )


def encode_jpeg_420(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JFIF with 4:2:0 chroma
    subsampling (the ubiquitous camera/web profile; encode_jpeg is the
    4:4:4 variant). One interleaved scan: each MCU carries 2×2 Y blocks +
    one Cb + one Cr (T.81 A.2.3)."""
    h, w = img.shape[:2]
    quants, tl, tc, mcuy, mcux = _coef_grids_420(img, quality)
    dc_tabs = (_huff_codes(*_DC_L), _huff_codes(*_DC_C), _huff_codes(*_DC_C))
    ac_tabs = (_huff_codes(*_AC_L), _huff_codes(*_AC_C), _huff_codes(*_AC_C))
    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for byy in range(2):
                for bxx in range(2):
                    zz = quants[0][2 * my + byy, 2 * mx + bxx].ravel()[_ZIGZAG]
                    pred[0] = _write_dc(bw, int(zz[0]), pred[0], dc_tabs[0])
                    _write_ac(bw, zz, ac_tabs[0])
            for ci in (1, 2):
                zz = quants[ci][my, mx].ravel()[_ZIGZAG]
                pred[ci] = _write_dc(bw, int(zz[0]), pred[ci], dc_tabs[ci])
                _write_ac(bw, zz, ac_tabs[ci])
    bw.flush()
    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return _headers_420(h, w, tl, tc, 0xFFC0) + sos + bytes(bw.out) + b"\xff\xd9"


def encode_jpeg_progressive_420(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 3) uint8 RGB as PROGRESSIVE (SOF2) JFIF with 4:2:0
    chroma: an interleaved DC first scan at al=1, a DC successive-
    approximation refinement scan (one raw bit per block), then one
    spectral-selection AC scan (1..63) per component over that component's
    OWN non-interleaved block grid. Coefficients are identical to
    encode_jpeg_420's, so decoding both streams must give identical pixels
    — the transcode-equality argument the tests use to validate subsampled
    progressive decode against the externally-validated baseline path."""
    h, w = img.shape[:2]
    quants, tl, tc, mcuy, mcux = _coef_grids_420(img, quality)
    dc_tabs = (_huff_codes(*_DC_L), _huff_codes(*_DC_C), _huff_codes(*_DC_C))
    ac_tabs = (_huff_codes(*_AC_L), _huff_codes(*_AC_C), _huff_codes(*_AC_C))
    hs, vs = (2, 1, 1), (2, 1, 1)
    out = _headers_420(h, w, tl, tc, 0xFFC2)

    # scan 1: interleaved DC, ah=0 al=1 — codes diffs of (DC >> 1); numpy's
    # arithmetic shift matches T.81's point transform for negatives
    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                for byy in range(vs[ci]):
                    for bxx in range(hs[ci]):
                        v = int(quants[ci][my * vs[ci] + byy, mx * hs[ci] + bxx, 0, 0]) >> 1
                        pred[ci] = _write_dc(bw, v, pred[ci], dc_tabs[ci])
    bw.flush()
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x01])) + bytes(bw.out)

    # scan 2: DC refinement, ah=1 al=0 — one raw bit (DC & 1) per block
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                for byy in range(vs[ci]):
                    for bxx in range(hs[ci]):
                        bw.put(int(quants[ci][my * vs[ci] + byy, mx * hs[ci] + bxx, 0, 0]) & 1, 1)
    bw.flush()
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x10])) + bytes(bw.out)

    # scans 3-5: per-component AC spectral selection over the component's
    # non-interleaved grid (ceil of its true sample dims — NOT the padded
    # MCU allocation; T.81 A.2.2)
    ch, cw = -(-h // 2), -(-w // 2)  # chroma sample dims: ceil(h/2), ceil(w/2)
    nid = [
        (-(-h // 8), -(-w // 8)),
        (-(-ch // 8), -(-cw // 8)),
        (-(-ch // 8), -(-cw // 8)),
    ]
    for ci in range(3):
        bw = _BitWriter()
        nh, nw = nid[ci]
        for by in range(nh):
            for bx in range(nw):
                zz = quants[ci][by, bx].ravel()[_ZIGZAG]
                _write_ac(bw, zz, ac_tabs[ci])
        bw.flush()
        cid, act = ci + 1, (0x00 if ci == 0 else 0x11)
        out += _seg(0xFFDA, bytes([1, cid, act, 1, 63, 0x00])) + bytes(bw.out)
    return out + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:  # stuffing: FF 00 means literal FF
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume a restart marker: drop buffered bits (pad), scan forward
        to the RSTn bytes (stuffing guarantees no false marker in data)."""
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _huff_read(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(mag: int, size: int) -> int:
    if size == 0:
        return 0
    return mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline sequential JFIF (SOF0, 8-bit; 4:4:4, 4:2:2, 4:2:0
    or grayscale; restart intervals honored) to (h, w, 3) uint8 RGB.
    Progressive (SOF2) streams — subsampled or not — are handled by
    _decode_progressive. Chroma planes are upsampled by replication.
    Raises NotImplementedError for profiles that need a full library:
    arithmetic coding, 12-bit, CMYK, multi-scan non-interleaved
    baseline."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    restart_interval = 0
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, q_table)
    scan: list[tuple[int, int, int]] = []   # (comp idx, dc table, ac table)
    data = b""
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables unsupported")
                t = np.zeros(64)
                t[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtabs[tid] = t
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (dc_maps if cls == 0 else ac_maps)[tid] = _huff_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG supported")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp, tq))
        elif marker == 0xFFC2:
            return _decode_progressive(payload)
        elif marker in (0xFFC1, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise NotImplementedError("only baseline/progressive DCT supported")
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, (c, _, _) in enumerate(comps) if c == cid)
                scan.append((idx, tabs >> 4, tabs & 0xF))
            data = payload[pos + 2 + length :]
            break
        pos += 2 + length
    if h is None or not scan:
        raise ValueError("JPEG missing SOF0/SOS")
    if len(comps) not in (1, 3):
        # 4-component Adobe CMYK/YCCK must not be pushed through the
        # 3-channel YCbCr transform — that would silently corrupt pixels.
        raise NotImplementedError(f"{len(comps)}-component JPEG (CMYK/YCCK) unsupported")
    if len(comps) > 1 and len(scan) < len(comps):
        # Multi-scan non-interleaved color baseline: we only parse up to the
        # first SOS, so decoding would yield Y with zeroed chroma — refuse
        # rather than mis-decode (honors the docstring contract).
        raise NotImplementedError(
            f"multi-scan baseline JPEG unsupported (first SOS covers "
            f"{len(scan)} of {len(comps)} components)"
        )

    # General interleaved-MCU geometry (T.81 A.2.3): an MCU carries
    # h_i × v_i blocks of component i; each component's plane is sampled at
    # (h_i/hmax, v_i/vmax) of full resolution and is replicated back up
    # after decode (covers 4:4:4, 4:2:2 and the ubiquitous 4:2:0).
    # A single-component scan is non-interleaved: one data unit per MCU
    # regardless of declared sampling factors (T.81 A.2.2).
    nc = len(comps)
    if len(scan) == 1:
        hs, vs = [1] * nc, [1] * nc
    else:
        hs = [comps[i][1] >> 4 for i in range(nc)]
        vs = [comps[i][1] & 0xF for i in range(nc)]
    hmax, vmax = max(hs), max(vs)
    if any(hmax % x or x < 1 for x in hs) or any(vmax % x or x < 1 for x in vs):
        raise NotImplementedError("non-integer chroma sampling ratios unsupported")
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * 8 * vs[i], mcux * 8 * hs[i])) for i in range(nc)]
    br = _BitReader(data)
    pred = [0] * nc
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                br.restart()
                pred = [0] * nc
            mcu_n += 1
            for idx, dct, act in scan:
                for byy in range(vs[idx]):
                    for bxx in range(hs[idx]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _huff_read(br, dc_maps[dct])
                        diff = _extend(br.bits(size), size) if size else 0
                        pred[idx] += diff
                        zz[0] = pred[idx]
                        k = 1
                        while k < 64:
                            sym = _huff_read(br, ac_maps[act])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("invalid AC run/size")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = np.zeros(64)
                        coef[_ZIGZAG] = zz
                        coef = coef.reshape(8, 8) * qtabs[comps[idx][2]].reshape(8, 8)
                        block = _DCT.T @ coef @ _DCT + 128.0
                        y0 = (my * vs[idx] + byy) * 8
                        x0 = (mx * hs[idx] + bxx) * 8
                        planes[idx][y0 : y0 + 8, x0 : x0 + 8] = block
    full = np.stack(
        [
            np.repeat(np.repeat(planes[i], vmax // vs[i], axis=0), hmax // hs[i], axis=1)
            for i in range(nc)
        ],
        axis=-1,
    )[:h, :w]
    if nc == 1:  # grayscale: replicate Y
        y = np.clip(full[..., 0].round(), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[..., None], 3, axis=2))
    rgb = _ycbcr_to_rgb(full)
    return np.ascontiguousarray(rgb)


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


def _entropy_end(payload: bytes, start: int) -> int:
    """Index of the first real marker (not stuffing, not RSTn) at/after start."""
    p = start
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00 and not (
            0xD0 <= payload[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return len(payload)


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2) decoder: coefficients accumulate across the
    spectral-selection / successive-approximation scan sequence (T.81 §G),
    then one dequantize + IDCT pass reconstructs. Supports non-interleaved
    and interleaved DC scans, AC first + AC refinement scans with EOB runs,
    restart intervals, grayscale, and SUBSAMPLED color (4:2:0/4:2:2 — the
    general T.81 A.1.1 geometry: interleaved DC scans walk h_i×v_i blocks
    per MCU; single-component scans walk that component's OWN ceil(x_i/8)
    × ceil(y_i/8) block grid, which is smaller than the MCU-padded
    allocation; chroma planes upsample by replication after IDCT).
    Validated by transcode equality against the externally-validated
    baseline 4:2:0 decode path (tests/test_codecs.py)."""
    pos = 2
    qz: dict[int, np.ndarray] = {}  # quant tables in ZIGZAG order
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    restart_interval = 0
    h = w = None
    comps: list[tuple[int, int, int]] = []
    coefs: list[np.ndarray] = []
    grids: list[tuple[int, int]] = []      # MCU-padded coefficient allocation
    nidims: list[tuple[int, int]] = []     # non-interleaved scan block dims
    hs: list[int] = []
    vs: list[int] = []
    mcu_dims = (0, 0)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qz[tid] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.float64
                )
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (dc_maps if cls == 0 else ac_maps)[tid] = _huff_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFC2:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component progressive JPEG unsupported")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp, tq))
            hs = [c[1] >> 4 for c in comps]
            vs = [c[1] & 0xF for c in comps]
            hmax, vmax = max(hs), max(vs)
            if any(hmax % x or x < 1 for x in hs) or any(vmax % x or x < 1 for x in vs):
                raise NotImplementedError("non-integer chroma sampling ratios unsupported")
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            mcu_dims = (mcuy, mcux)
            for i in range(nc):
                bh_, bw_ = mcuy * vs[i], mcux * hs[i]
                grids.append((bh_, bw_))
                coefs.append(np.zeros((bh_, bw_, 64), dtype=np.int64))
                # T.81 A.1.1: component sample dims x_i=ceil(w·h_i/hmax),
                # y_i=ceil(h·v_i/vmax); non-interleaved scans cover exactly
                # ceil(y_i/8) × ceil(x_i/8) data units of this component
                xi, yi = -(-w * hs[i] // hmax), -(-h * vs[i] // vmax)
                nidims.append((-(-yi // 8), -(-xi // 8)))
        elif marker == 0xFFDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, (c, _, _) in enumerate(comps) if c == cid)
                scan.append((idx, tabs >> 4, tabs & 0xF))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            end = _entropy_end(payload, pos + 2 + length)
            _progressive_scan(
                payload[pos + 2 + length : end],
                scan, ss, se, ah, al,
                coefs, nidims, dc_maps, ac_maps, restart_interval,
                hs, vs, mcu_dims,
            )
            pos = end
            continue
        pos += 2 + length
    if h is None:
        raise ValueError("JPEG missing SOF2")
    hmax, vmax = max(hs), max(vs)
    planes = []
    for i, (bh_, bw_) in enumerate(grids):
        qt = qz[comps[i][2]]
        deq = coefs[i] * qt  # zigzag order
        nat = np.zeros((bh_, bw_, 64))
        nat[:, :, _ZIGZAG] = deq
        blocks = np.einsum("ij,abjk,lk->abil", _DCT.T, nat.reshape(bh_, bw_, 8, 8), _DCT.T)
        plane = blocks.transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8) + 128.0
        # crop to the component's true sample dims, then replicate up
        xi, yi = -(-w * hs[i] // hmax), -(-h * vs[i] // vmax)
        plane = plane[:yi, :xi]
        plane = np.repeat(np.repeat(plane, vmax // vs[i], axis=0), hmax // hs[i], axis=1)
        planes.append(plane[:h, :w])
    full = np.stack(planes, axis=-1)
    if len(comps) == 1:
        y = np.clip(full[..., 0].round(), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[..., None], 3, axis=2))
    return np.ascontiguousarray(_ycbcr_to_rgb(full))


def _progressive_scan(
    data, scan, ss, se, ah, al, coefs, nidims, dc_maps, ac_maps, restart_interval,
    hs, vs, mcu_dims,
):
    """Apply one progressive scan to the coefficient accumulators.
    Interleaved (multi-component) DC scans traverse MCUs carrying h_i×v_i
    blocks per component (T.81 A.2.3); single-component scans — DC or AC —
    are non-interleaved and traverse that component's own block grid
    (`nidims`, T.81 A.2.2), one data unit per restart-counted MCU."""
    br = _BitReader(data)
    pred = {idx: 0 for idx, _, _ in scan}
    eobrun = 0
    unit_n = 0

    def maybe_restart():
        nonlocal eobrun, unit_n
        if restart_interval and unit_n and unit_n % restart_interval == 0:
            br.restart()
            for k in pred:
                pred[k] = 0
            eobrun = 0
        unit_n += 1

    def dc_unit(idx, dct, by, bx):
        c = coefs[idx]
        if ah == 0:
            size = _huff_read(br, dc_maps[dct])
            diff = _extend(br.bits(size), size) if size else 0
            pred[idx] += diff
            c[by, bx, 0] = pred[idx] << al
        else:
            if br.bit():
                c[by, bx, 0] |= 1 << al

    if ss == 0 and len(scan) > 1:  # interleaved DC scan: MCU traversal
        mcuy, mcux = mcu_dims
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for idx, dct, _ in scan:
                    for byy in range(vs[idx]):
                        for bxx in range(hs[idx]):
                            dc_unit(idx, dct, my * vs[idx] + byy, mx * hs[idx] + bxx)
        return
    if ss == 0:  # non-interleaved DC scan: one component's own grid
        idx, dct, _ = scan[0]
        bh_, bw_ = nidims[idx]
        for by in range(bh_):
            for bx in range(bw_):
                maybe_restart()
                dc_unit(idx, dct, by, bx)
        return
    # AC scans are always single-component (T.81 B.2.3)
    idx, _, act = scan[0]
    c = coefs[idx]
    bh_, bw_ = nidims[idx]
    p1, m1 = 1 << al, -1 << al
    for by in range(bh_):
        for bx in range(bw_):
            maybe_restart()
            blk = c[by, bx]
            if ah == 0:  # first pass for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _huff_read(br, ac_maps[act])
                    r, s = sym >> 4, sym & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC band overflow")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
            else:  # refinement pass (T.81 G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _huff_read(br, ac_maps[act])
                        r, s = sym >> 4, sym & 0xF
                        val = 0
                        if s == 0:
                            if r < 15:
                                # NOT pre-decremented (unlike the first
                                # pass): the tail handler below refines the
                                # CURRENT block's remaining nonzero history
                                # and then consumes one unit of the run
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: advance past 16 zero-history coeffs
                        else:
                            val = p1 if br.bit() else m1
                        while k <= se:
                            cur = int(blk[k])
                            if cur != 0:
                                if br.bit() and (cur & p1) == 0:
                                    blk[k] = cur + (p1 if cur > 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if br.bit() and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur > 0 else m1)
                        k += 1
                    eobrun -= 1
