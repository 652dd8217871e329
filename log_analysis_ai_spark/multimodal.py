"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, `mapInPandas`
decode/feature/resize/frame-sample operators, partitioning by media type —
is real and tested. The codec layer (codecs.py) is REAL for the formats
pure stdlib+numpy can decode: PNG (zlib inflate + scanline unfilter),
uncompressed 24-bit BMP, PCM WAV, and baseline-sequential JPEG (SOF0 —
encode at 4:4:4; decode also 4:2:0/4:2:2/grayscale — standard Annex-K
Huffman/quant tables, from-scratch DCT + entropy coder; round-trip
PSNR-tested and validated against externally produced libjpeg files,
including a real 4:2:0 photograph); progressive (SOF2) decode is real
too, subsampled chroma included (validated by transcode equality against
the baseline 4:2:0 path). Exotic JPEG profiles (arithmetic coding,
12-bit, CMYK) and MP4/video genuinely need external libraries
(PIL/ffmpeg) this container does not ship, so those are stubbed: `decode_stub=True` (default) substitutes a
deterministic fake decode for UNSUPPORTED payloads only — supported ones
always decode for real — while `decode_stub=False` raises
NotImplementedError at the exact plug point.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codecs

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads where the
    codec layer is real: PNG images (gradient + id-seeded pattern), PCM WAV
    audio (two-tone sine), and fake bytes for video (mp4 decode is
    stubbed)."""
    rows = []
    kinds = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    for i in range(n):
        kind, mime = kinds[i % 3]
        if kind == "image" and (i // 3) % 2 == 1:
            mime = "image/jpeg"  # alternate PNG / baseline JPEG payloads
        w, h = 64 + i % 32, 48 + i % 16
        dur = 1000 * (1 + i % 7)
        if kind == "image":
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)),
                    (yy * 255 // max(h - 1, 1)),
                    ((xx + yy + i * 17) % 256),
                ],
                axis=2,
            ).astype(np.uint8)
            payload = (
                codecs.encode_jpeg(img, quality=92)
                if mime == "image/jpeg"
                else codecs.encode_png(img)
            )
        elif kind == "audio":
            t = np.arange(0, 1600) / 16000.0
            f0 = 220.0 + 20.0 * (i % 13)
            payload = codecs.encode_wav(
                0.5 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * 3 * f0 * t)
            )
        else:
            payload = hashlib.blake2b(f"media-{i}".encode(), digest_size=64).digest()
        rows.append((i, kind, mime, w, h, dur, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for an UNSUPPORTED payload's decode (video,
    exotic JPEG profiles): pseudo-pixels from a keyed hash of the payload."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image(payload: bytes, mime: str) -> np.ndarray:
    """REAL image decode for the supported container formats."""
    if mime == "image/png":
        return codecs.decode_png(payload)
    if mime == "image/bmp":
        return codecs.decode_bmp(payload)
    if mime == "image/jpeg":
        return codecs.decode_jpeg(payload)  # baseline + progressive (codecs.py)
    raise NotImplementedError(f"decode for {mime} requires PIL — not in this container")


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode → per-media feature vector, Arrow-batched.

    image/png, image/bmp, baseline image/jpeg: real decode (codecs.py)
    → 4x4 grid + RGB means.
    audio/wav: real PCM decode → rms/zcr/centroid/band energies.
    other mimes: deterministic fake when `decode_stub` (the honest plug
    point), NotImplementedError otherwise.

    Output: media_id, kind, feature: array<float> (FEATURE_DIM)."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mime, w, h in zip(
                pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]
            ):
                b = bytes(payload)
                if mime in ("image/png", "image/bmp", "image/jpeg"):
                    vec = codecs.image_features(decode_image(b, mime), FEATURE_DIM)
                elif mime == "audio/wav":
                    vec = codecs.audio_features(*codecs.decode_wav(b), dim=FEATURE_DIM)
                elif decode_stub:
                    vec = codecs.image_features(
                        _fake_decode(b, int(w), int(h)), FEATURE_DIM
                    )
                else:
                    raise NotImplementedError(
                        f"real decode for {mime} requires PIL/ffmpeg — "
                        "not present in this container"
                    )
                feats.append(vec)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.select("media_id", "kind", "mime", "width", "height", "payload").mapInPandas(
        fe, schema="media_id long, kind string, feature array<float>"
    )


def resize_images(
    df: DataFrame, size: tuple[int, int] = (32, 32), decode_stub: bool = True
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (PNG out). Real for
    png/bmp/jpeg inputs; unsupported mimes use the fake decode when
    `decode_stub` (schema/partitioning identical), else raise."""
    tw, th = size

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload, mime, w, h in zip(
                pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]
            ):
                b = bytes(payload)
                if mime in ("image/png", "image/bmp", "image/jpeg"):
                    img = decode_image(b, mime)
                elif decode_stub:
                    img = _fake_decode(b, int(w), int(h))
                else:
                    raise NotImplementedError(
                        f"real resize for {mime} requires PIL — not in this container"
                    )
                outs.append(bytearray(codecs.encode_png(codecs.resize_nearest(img, (tw, th)))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": tw,
                    "height": th,
                    "payload": outs,
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "mime", "width", "height", "payload")
        .mapInPandas(rs, schema="media_id long, width int, height int, payload binary")
    )


def sample_frames(df: DataFrame, every_ms: int = 500, decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one row per sampled frame timestamp. The frame
    grab is stubbed (mp4 demux genuinely needs ffmpeg); the row explosion +
    schema are the real contract."""

    def sf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts_ms, frames = [], [], []
            for mid, dur, payload in zip(pdf["media_id"], pdf["duration_ms"], pdf["payload"]):
                if not decode_stub:
                    raise NotImplementedError("real frame grab requires ffmpeg")
                for t in range(0, int(dur), every_ms):
                    ids.append(mid)
                    ts_ms.append(t)
                    frames.append(
                        bytearray(
                            hashlib.blake2b(bytes(payload) + t.to_bytes(4, "big"), digest_size=32).digest()
                        )
                    )
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": ts_ms, "frame": frames})

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms", "payload")
        .mapInPandas(sf, schema="media_id long, frame_ts_ms int, frame binary")
    )
