from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)
from log_analysis_ai_spark.operators.anomaly import rate_anomalies, zscore_by_group, zscore_global


def test_zscore_global(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)] + [(1000.0,)], "x double")
    out = zscore_global(df, "x", k=3.0)
    anomalies = [r.x for r in out.filter("is_anomaly").collect()]
    assert anomalies == [1000.0]


def test_zscore_by_group(spark):
    rows = [("a", float(i)) for i in range(50)] + [("a", 500.0)] + [("b", 1.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = zscore_by_group(df, "x", ["g"], k=3.0)
    assert [r.x for r in out.filter("is_anomaly").collect()] == [500.0]


def test_rate_anomalies_on_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = rate_anomalies(ev, key="event_type", window="1 day", k=2.0)
    assert out.count() > 0
    assert set(out.columns) == {"event_type", "window_start", "n", "zscore", "is_anomaly"}


def test_media_feature_extraction_deterministic(spark):
    media = synth_media(spark, 24)
    f1 = {r.media_id: list(r.feature) for r in extract_features(media).collect()}
    f2 = {r.media_id: list(r.feature) for r in extract_features(media.repartition(7)).collect()}
    assert f1 == f2  # partitioning-invariant
    assert all(len(v) == FEATURE_DIM for v in f1.values())


def test_media_decode_stub_gate(spark):
    media = synth_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, decode_stub=False).collect()


def test_real_decode_no_stub_for_supported_mimes(spark):
    """png/wav decode is REAL now: decode_stub=False succeeds for image+
    audio rows (only video, whose mp4 demux genuinely needs ffmpeg, still
    gates). And the audio feature's spectral centroid tracks the synth
    pitch ladder — physical evidence the PCM actually decoded."""
    media = synth_media(spark, 24).filter(F.col("kind") != "video")
    rows = extract_features(media, decode_stub=False).collect()
    assert len(rows) == 16  # 8 images + 8 audios
    cents = {
        r.media_id: r.feature[2] for r in rows if r.media_id % 3 == 1  # audio rows
    }
    # synth pitch is 220 + 20*(i % 13): ranking media ids by measured
    # centroid must equal ranking them by their synth f0
    by_centroid = sorted(cents, key=cents.get)
    by_f0 = sorted(cents, key=lambda i: 220 + 20 * (i % 13))
    assert by_centroid == by_f0


def test_resize_images_real_roundtrip(spark):
    """resize_images REALLY decodes (PNG or baseline JPEG per the source
    mime), resizes, re-encodes: each output payload must be a decodable
    16x16 PNG equal to the nearest-resize of the original decoded image."""
    import numpy as np

    from log_analysis_ai_spark import codecs
    from log_analysis_ai_spark.multimodal import decode_image

    media = synth_media(spark, 12)
    out = {r.media_id: r for r in resize_images(media, size=(16, 16)).collect()}
    src = {r.media_id: r for r in media.filter(F.col("kind") == "image").collect()}
    assert {r.mime for r in src.values()} == {"image/png", "image/jpeg"}
    for mid, r in out.items():
        assert r.width == 16 and r.height == 16
        got = codecs.decode_png(bytes(r.payload))
        want = codecs.resize_nearest(
            decode_image(bytes(src[mid].payload), src[mid].mime), (16, 16)
        )
        assert np.array_equal(got, want)


def test_sample_frames(spark):
    media = synth_media(spark, 12)
    out = sample_frames(media, every_ms=500)
    pdf = out.toPandas()
    vids = media.filter(F.col("kind") == "video").select("media_id", "duration_ms").collect()
    expected = sum(len(range(0, r.duration_ms, 500)) for r in vids)
    assert len(pdf) == expected
    assert (pdf.frame_ts_ms % 500 == 0).all()
