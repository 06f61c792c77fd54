"""Tests for multimodal column plumbing: binary payloads + typed
metadata, Arrow-batched decode/feature stages, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tmdb_index_spark.operators.multimodal import (
    MEDIA_STRUCT,
    decode_media,
    fake_codec,
    media_features,
    sample_frames,
    unavailable_codec,
)


def _media(spark):
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media", MEDIA_STRUCT),
        ]
    )
    rows = [
        (0, (b"\x89PNG-payload-0", "image/png", "s3://bucket/0.png")),
        (1, (b"RIFF-wav-payload-1", "audio/wav", "s3://bucket/1.wav")),
        (2, (b"", "image/png", "s3://bucket/2.png")),  # empty payload
        (3, None),  # null media
    ]
    return spark.createDataFrame(rows, schema)


def test_decode_media_appends_typed_fields(spark):
    out = decode_media(_media(spark)).orderBy("media_id").collect()
    assert [f.name for f in decode_media(_media(spark)).schema.fields[-4:]] == [
        "width", "height", "n_frames", "decode_ok",
    ]
    img, wav, empty, null = out
    assert img["decode_ok"] and img["n_frames"] == 1  # images are single-frame
    assert wav["decode_ok"] and wav["n_frames"] > 1
    assert empty["decode_ok"] is False and empty["width"] is None
    assert null["decode_ok"] is None


def test_decode_media_deterministic(spark):
    a = decode_media(_media(spark)).orderBy("media_id").collect()
    b = decode_media(_media(spark)).orderBy("media_id").collect()
    assert a == b


def test_unavailable_codec_raises_with_dependency_hint():
    with pytest.raises(NotImplementedError, match="Pillow"):
        unavailable_codec(b"bytes", "image/png")


def test_fake_codec_stable():
    assert fake_codec(b"abc", "image/png") == fake_codec(b"abc", "image/png")
    assert fake_codec(b"abc", "image/png") != fake_codec(b"abd", "image/png")


def test_media_features_shape(spark):
    out = media_features(_media(spark), dim=16).orderBy("media_id").collect()
    assert len(out[0]["features"]) == 16
    assert all(-1.0 <= v <= 1.0 for v in out[0]["features"])
    assert out[2]["features"] is None  # empty payload
    assert out[3]["features"] is None  # null media


def test_sample_frames_plan(spark):
    df = spark.createDataFrame(
        [(0, 61), (1, 1), (2, None)], "media_id long, n_frames long"
    )
    out = sample_frames(df, every_n=30, id_col="media_id").collect()
    got = sorted((r["media_id"], r["frame_idx"]) for r in out)
    assert got == [(0, 0), (0, 30), (0, 60), (1, 0)]
