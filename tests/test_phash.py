"""pHash: DCT basis parity vs a direct nested-loop DCT, perceptual
robustness across a real codec change (PNG -> JPEG q88 + brightness),
multi-index Hamming join completeness vs brute force, and end-to-end
planted-pair recall on the synthetic corpus."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark import codecs
from log_analysis_ai_spark.multimodal import (
    PHASH_GRID,
    _dct_matrix,
    hamming_near_dups,
    phash_images,
    phash_pixels,
    synth_phash_corpus,
)


def test_dct_matrix_matches_direct_definition():
    n = 8
    d = _dct_matrix(n)
    x = np.arange(n * n, dtype=np.float64).reshape(n, n) ** 1.3
    got = d @ x @ d.T
    ref = np.zeros((n, n))
    for k in range(n):
        for l in range(n):
            s = 0.0
            for i in range(n):
                for j in range(n):
                    s += (
                        x[i, j]
                        * math.cos(math.pi * (i + 0.5) * k / n)
                        * math.cos(math.pi * (j + 0.5) * l / n)
                    )
            ck = math.sqrt(1.0 / n) if k == 0 else math.sqrt(2.0 / n)
            cl = math.sqrt(1.0 / n) if l == 0 else math.sqrt(2.0 / n)
            ref[k, l] = ck * cl * s
    assert np.allclose(got, ref, atol=1e-9)
    # orthonormal: D @ D.T == I
    d32 = _dct_matrix(PHASH_GRID)
    assert np.allclose(d32 @ d32.T, np.eye(PHASH_GRID), atol=1e-12)


def _smooth_image(seed: int, w: int = 64, h: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    grid = rng.uniform(0, 255, size=(6, 8, 3))
    yy = np.linspace(0, 5, h)
    xx = np.linspace(0, 7, w)
    y0, x0 = np.floor(yy).astype(int), np.floor(xx).astype(int)
    y1, x1 = np.minimum(y0 + 1, 5), np.minimum(x0 + 1, 7)
    fy, fx = (yy - y0)[:, None, None], (xx - x0)[None, :, None]
    return (
        grid[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + grid[np.ix_(y0, x1)] * (1 - fy) * fx
        + grid[np.ix_(y1, x0)] * fy * (1 - fx)
        + grid[np.ix_(y1, x1)] * fy * fx
    ).astype(np.uint8)


def test_phash_robust_to_codec_and_brightness_distinct_for_others():
    imgs = [_smooth_image(s) for s in range(12)]
    hs = [phash_pixels(im) for im in imgs]
    # deterministic + bit-width sanity
    assert hs == [phash_pixels(im) for im in imgs]
    assert all(-(1 << 63) <= h < (1 << 63) for h in hs)
    # PNG roundtrip is lossless -> identical hash
    assert phash_pixels(codecs.decode_png(codecs.encode_png(imgs[0]))) == hs[0]
    # JPEG q88 + small brightness shift -> small Hamming distance
    for im, h in zip(imgs[:6], hs[:6]):
        pert = np.clip(im.astype(np.int16) + 2, 0, 255).astype(np.uint8)
        h2 = phash_pixels(codecs.decode_jpeg(codecs.encode_jpeg(pert, quality=88)))
        assert bin((h ^ h2) & ((1 << 64) - 1)).count("1") <= 8
    # distinct smooth images are far apart
    dists = [
        bin((a ^ b) & ((1 << 64) - 1)).count("1") for a, b in itertools.combinations(hs, 2)
    ]
    assert min(dists) > 10


def test_hamming_near_dups_complete_vs_brute_force(spark):
    rng = np.random.default_rng(7)
    base = [int(x) for x in rng.integers(-(1 << 63), 1 << 63, size=30, dtype=np.int64)]
    rows = [(i, h) for i, h in enumerate(base)]
    # planted neighbors at exact radii 1, 8 (=max), 9 (just outside)
    def flip(h, k):
        for b in range(k):
            h ^= 1 << (b * 7)
        return h - (1 << 64) if h >= (1 << 63) else h
    rows += [(100, flip(base[0] & ((1 << 64) - 1), 1)),
             (101, flip(base[1] & ((1 << 64) - 1), 8)),
             (102, flip(base[2] & ((1 << 64) - 1), 9))]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_dups(df, max_hamming=8).collect()
    }
    exp = set()
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 8:
            exp.add((min(ia, ib), max(ia, ib), d))
    assert got == exp
    assert (0, 100, 1) in got and (1, 101, 8) in got
    assert not any(ia == 2 and ib == 102 for ia, ib, _ in got)
    with pytest.raises(ValueError, match="max_hamming"):
        hamming_near_dups(df, max_hamming=64)


def test_end_to_end_planted_recall_and_parallelism_invariance(spark):
    media = synth_phash_corpus(spark, 24)
    ph = phash_images(media)
    pairs = {(r.id_a, r.id_b) for r in hamming_near_dups(ph, max_hamming=10).collect()}
    planted = {(i, i + 1000) for i in range(24) if i % 4 == 0}
    assert planted <= pairs          # every perceptual near-dup found
    assert pairs == planted          # no false pairs among distinct images
    pairs2 = {
        (r.id_a, r.id_b)
        for r in hamming_near_dups(phash_images(media.repartition(7)), max_hamming=10).collect()
    }
    assert pairs2 == pairs


def test_hamming_radius_zero_exact_match_band(spark):
    # radius 0 -> ONE 64-bit band; the mask must be the signed all-ones
    # long ((1<<64)-1 would overflow LongType at analysis time)
    rows = [(0, -5), (1, -5), (2, 7), (3, 7), (4, 9)]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in hamming_near_dups(df, max_hamming=0).collect()}
    assert got == {(0, 1, 0), (2, 3, 0)}
