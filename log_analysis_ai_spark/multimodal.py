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


# ---------------------------------------------------------------------------
# Perceptual hashing (pHash) + Hamming near-dup join
# ---------------------------------------------------------------------------

PHASH_GRID = 32  # DCT input side; the low-frequency block is the top-left 8x8


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: row k, column j = sqrt(2/n)*cos(pi*(j+.5)*k/n),
    row 0 scaled by 1/sqrt(2). 2-D DCT of X is then D @ X @ D.T."""
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (j + 0.5) * k / n)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d


_DCT32 = _dct_matrix(PHASH_GRID)


def _resize_bilinear_gray(img: np.ndarray, n: int) -> np.ndarray:
    """Luma (BT.601) then bilinear resample at target pixel CENTERS — a
    fixed deterministic convention (the pHash literature doesn't specify
    one; robustness comes from the 8x8 low-pass, not the resampler)."""
    gray = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    h, w = gray.shape
    ys = (np.arange(n) + 0.5) * h / n - 0.5
    xs = (np.arange(n) + 0.5) * w / n - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = gray[np.ix_(y0, x0)]
    b = gray[np.ix_(y0, x1)]
    c = gray[np.ix_(y1, x0)]
    d = gray[np.ix_(y1, x1)]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx


def phash_pixels(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an RGB uint8 array (Zauner 2010,
    "Implementation and Benchmarking of Perceptual Image Hash Functions";
    the imagehash-library convention: median over the FULL top-left 8x8
    DCT block, DC included, bit set where coefficient > median). Returns
    a SIGNED 64-bit int (Spark LongType two's-complement view)."""
    small = _resize_bilinear_gray(img.astype(np.float64), PHASH_GRID)
    coef = _DCT32 @ small @ _DCT32.T
    low = coef[:8, :8]
    med = np.median(low)
    bits = (low > med).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_images(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(media_id, phash) for every image row — decode (REAL for
    png/bmp/jpeg via codecs.py) + pHash in ONE Arrow mapInPandas pass; the
    32x32 DCT basis is a module constant shipped in the task closure.
    Non-image kinds are filtered out up front (predicate pushes to the
    scan); unsupported image mimes follow the decode_stub convention of
    extract_features."""

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
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
                        f"real decode for {mime} requires PIL — not in this container"
                    )
                hashes.append(phash_pixels(img))
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": pd.array(hashes, dtype="int64")})

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "mime", "width", "height", "payload")
        .mapInPandas(ph, schema="media_id long, phash long")
    )


def hamming_near_dups(
    df: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 8,
    max_bucket_size: int | None = None,
    report: dict | None = None,
) -> DataFrame:
    """All pairs within `max_hamming` of each other on a 64-bit hash
    column — multi-index Hamming search (Norouzi, Punjani & Fleet, CVPR
    2012): split the word into m = max_hamming+1 disjoint substrings; by
    pigeonhole any pair within the radius agrees EXACTLY on at least one
    substring, so candidates come from m equi-joins (expressed as one
    self-join on (band, chunk)) and bit_count(xor) verifies JVM-side.
    COMPLETE by construction (no probabilistic recall); `max_bucket_size`
    optionally trades completeness for hot-bucket skew defusal with drop
    accounting via `report`, the family convention of simhash_near_dups.

    Scale shape: the banded table is m rows per input (id, hash, band,
    chunk — 30ish bytes); the self-join shuffles on (band, chunk) whose
    cardinality grows with the corpus, so buckets stay small for
    non-pathological hash distributions; verification touches only
    bucket-colliding candidate pairs, never all pairs. Wider radii shrink
    substrings (64/m bits) and thicken buckets — the published multi-index
    tradeoff; radii beyond ~15 on 64-bit words want the guarded mode."""
    from .operators.dedup import guard_hot_buckets

    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    m = max_hamming + 1
    base, rem = divmod(64, m)
    widths = [base + 1] * rem + [base] * (m - rem)
    offsets = [sum(widths[:i]) for i in range(m)]
    # a 64-bit-wide band's mask (radius 0 -> one band = the whole word)
    # must be the signed all-ones long: (1<<64)-1 overflows LongType
    masks = [-1 if w == 64 else (1 << w) - 1 for w in widths]
    src = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
    banded = src.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("_h", offsets[i])
                        .bitwiseAND(F.lit(masks[i]))
                        .alias("chunk"),
                    )
                    for i in range(m)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_h", "bb.band", "bb.chunk")
    banded = guard_hot_buckets(banded, ["band", "chunk"], max_bucket_size, report)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def synth_phash_corpus(spark: SparkSession, n: int = 40) -> DataFrame:
    """Deterministic image corpus for pHash near-dup testing: n SMOOTH
    distinct images (id-seeded random 8x6 low-frequency grid, bilinearly
    upsampled — smooth content survives JPEG, unlike raw noise), each
    id%4==0 image re-encoded as JPEG q=88 with +2 brightness under id+1000
    (a true perceptual near-duplicate: same low-frequency structure,
    different bytes AND different codec)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        grid = rng.uniform(0, 255, size=(6, 8, 3))
        yy = np.linspace(0, 5, 48)
        xx = np.linspace(0, 7, 64)
        y0 = np.floor(yy).astype(int)
        x0 = np.floor(xx).astype(int)
        y1 = np.minimum(y0 + 1, 5)
        x1 = np.minimum(x0 + 1, 7)
        fy = (yy - y0)[:, None, None]
        fx = (xx - x0)[None, :, None]
        img = (
            grid[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + grid[np.ix_(y0, x1)] * (1 - fy) * fx
            + grid[np.ix_(y1, x0)] * fy * (1 - fx)
            + grid[np.ix_(y1, x1)] * fy * fx
        ).astype(np.uint8)
        rows.append((i, "image", "image/png", 64, 48, 0, bytearray(codecs.encode_png(img))))
        if i % 4 == 0:
            pert = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
            rows.append(
                (
                    i + 1000,
                    "image",
                    "image/jpeg",
                    64,
                    48,
                    0,
                    bytearray(codecs.encode_jpeg(pert, quality=88)),
                )
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
