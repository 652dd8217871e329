"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery is real and tested — schemas, Arrow batch shapes,
`mapInPandas` decode/feature/resize/frame-sample operators, partitioning by
media type. The codec step itself is STUBBED (this container ships no
image/audio libraries): `decode_stub=True` produces a deterministic fake
decode derived from the bytes; `decode_stub=False` raises NotImplementedError
at the exact point a real decoder (PIL/ffmpeg) would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    kinds = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    for i in range(n):
        kind, mime = kinds[i % 3]
        payload = hashlib.blake2b(f"media-{i}".encode(), digest_size=64).digest()
        rows.append((i, kind, mime, 64 + i % 32, 48 + i % 16, 1000 * (1 + i % 7), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: pseudo-pixels from a
    keyed hash of the payload. Replace with PIL.Image.open in production."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode → mean-pool features per media row, Arrow-batched.

    Output: media_id, kind, feature: array<float> (FEATURE_DIM)."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if not decode_stub:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg — not present in this container"
                    )
                img = _fake_decode(bytes(payload), int(w), int(h))
                # crop to a 4-divisible frame, mean-pool RGB over a 4x4 grid
                ch, cw = (int(h) // 4) * 4, (int(w) // 4) * 4
                img_c = img[:ch, :cw]
                g = img_c.reshape(4, ch // 4, 4, cw // 4, 3).mean(axis=(1, 3)).mean(axis=2)
                vec = np.concatenate([g.ravel()[:13], img.mean(axis=(0, 1))]) / 255.0
                feats.append(vec[:FEATURE_DIM].astype("float32"))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.select("media_id", "kind", "width", "height", "payload").mapInPandas(
        fe, schema="media_id long, kind string, feature array<float>"
    )


def resize_images(df: DataFrame, size: tuple[int, int] = (32, 32), decode_stub: bool = True) -> DataFrame:
    """Decode → resize → re-encode. Stub resize = decode fake pixels at the
    target size; output schema/partitioning match the real operator."""
    tw, th = size

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload in pdf["payload"]:
                if not decode_stub:
                    raise NotImplementedError("real resize requires PIL — not in this container")
                outs.append(bytearray(_fake_decode(bytes(payload), tw, th).tobytes()))
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
        .select("media_id", "payload")
        .mapInPandas(rs, schema="media_id long, width int, height int, payload binary")
    )


def sample_frames(df: DataFrame, every_ms: int = 500, decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one row per sampled frame timestamp. The frame
    grab is stubbed; the row explosion + schema are the real contract."""

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
