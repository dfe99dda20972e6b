"""Multimodal column plumbing tests — the Spark-side contract (schema,
batching, row expansion) is real even though the codec kernel is stubbed."""

import pytest
from pyspark.sql import Row

from trading_dashboard_spark.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_media_batch,
    frame_sample,
)


def _media_df(spark):
    rows = [
        Row(media_id=1, media_type="image", payload=b"\x89PNG-fake-bytes",
            meta=Row(width=64, height=64, duration_ms=None, codec="png")),
        Row(media_id=2, media_type="video", payload=b"fake-mp4",
            meta=Row(width=320, height=240, duration_ms=3500, codec="h264")),
        Row(media_id=3, media_type="audio", payload=None,
            meta=Row(width=None, height=None, duration_ms=1000, codec="wav")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_metadata_jvm_side(spark):
    df = attach_media_metadata(_media_df(spark))
    out = {r["media_id"]: (r["n_bytes"], r["payload_md5"]) for r in df.collect()}
    assert out[1][0] == 15 and out[3][0] is None


def test_decode_batch_deterministic_features(spark):
    df = decode_media_batch(_media_df(spark))
    a = df.collect()
    b = decode_media_batch(_media_df(spark)).collect()
    fa = {r["media_id"]: r["features"] for r in a}
    fb = {r["media_id"]: r["features"] for r in b}
    assert fa == fb
    assert len(fa[1]) == 8 and all(0 <= x <= 1 for x in fa[1])
    assert fa[3] == [0.0] * 8  # null payload -> zero features


def test_decode_real_path_raises(spark):
    with pytest.raises(Exception):
        decode_media_batch(_media_df(spark), fake=False).collect()


def test_frame_sample_row_expansion(spark):
    out = frame_sample(_media_df(spark), every_ms=1000).toPandas()
    per = out.groupby("media_id").size().to_dict()
    # 3500ms video -> 3 frames; image (no duration) -> 1; 1000ms audio -> 1
    assert per == {1: 1, 2: 3, 3: 1}
    assert set(out.columns) == {"media_id", "frame_idx", "frame_ms", "frame_features"}


def test_media_from_documents_deterministic(spark, sf_dir):
    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.multimodal.columns import media_from_documents

    media = media_from_documents(load_table(spark, "documents", sf_dir))
    rows = media.limit(10).collect()
    assert {r["media_type"] for r in media.select("media_type").distinct().collect()} == {
        "image", "audio", "video"
    }
    for r in rows:
        if r["media_type"] == "image":
            assert r["meta"]["width"] is not None and r["meta"]["duration_ms"] is None
        else:
            assert r["meta"]["width"] is None and r["meta"]["duration_ms"] is not None
        assert r["payload"] is not None
