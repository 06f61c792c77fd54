"""Tests for multimodal column plumbing: binary payloads + typed
metadata, Arrow-batched decode/feature stages, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tmdb_index_spark.operators.media_codec import (
    header_codec,
    make_bmp,
    make_gif,
    make_jpeg,
    make_png,
    make_wav,
    parse_bmp,
    parse_gif,
    parse_jpeg,
    parse_png,
    parse_wav,
    parse_webp,
    sniff_mime,
)
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
        (0, (make_png(320, 200), "image/png", "s3://bucket/0.png")),
        (1, (make_wav(4410), "audio/wav", "s3://bucket/1.wav")),
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
    assert img["decode_ok"] and (img["width"], img["height"]) == (320, 200)
    assert img["n_frames"] == 1  # still images are single-frame
    assert wav["decode_ok"] and wav["n_frames"] == 4410
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


# Golden bytes: a 1x1 grayscale PNG hand-assembled from the spec's
# byte offsets, independent of make_png, so a synth/parse bug (e.g.
# width/height swapped in both) can't cancel out.
_GOLDEN_PNG_1x1 = bytes.fromhex(
    "89504e470d0a1a0a"              # signature
    "0000000d49484452"              # len 13, IHDR
    "00000001000000010800000000"    # 1x1, bit depth 8, gray
    "3a7e9b55"                      # IHDR crc (unchecked by parser)
    "0000000b49444154"              # len 11, IDAT
    "789c636000000002000158"        # deflate of filter byte + 1 pixel
    "29bd0383"                      # IDAT crc (unchecked by parser)
    "0000000049454e44ae426082"      # IEND
)


def test_parse_png_golden_bytes():
    got = parse_png(_GOLDEN_PNG_1x1)
    assert (got["width"], got["height"], got["n_frames"], got["decode_ok"]) == (
        1, 1, 1, True,
    )


def test_header_parsers_roundtrip_known_dimensions():
    assert parse_png(make_png(640, 480)) == {
        "width": 640, "height": 480, "n_frames": 1, "decode_ok": True,
    }
    assert parse_jpeg(make_jpeg(1920, 1080)) == {
        "width": 1920, "height": 1080, "n_frames": 1, "decode_ok": True,
    }
    assert parse_gif(make_gif(33, 44, n_frames=7)) == {
        "width": 33, "height": 44, "n_frames": 7, "decode_ok": True,
    }
    assert parse_bmp(make_bmp(12, 34)) == {
        "width": 12, "height": 34, "n_frames": 1, "decode_ok": True,
    }
    assert parse_wav(make_wav(22_050, channels=2)) == {
        "width": None, "height": None, "n_frames": 22_050, "decode_ok": True,
    }


def test_parse_webp_variants():
    # Hand-packed headers per the container spec (no make_webp: the VP8
    # bitstreams here are header-only).
    vp8l_bits = (17 - 1) | ((23 - 1) << 14)
    vp8l = (
        b"RIFF" + (4 + 8 + 5).to_bytes(4, "little") + b"WEBP"
        + b"VP8L" + (5).to_bytes(4, "little")
        + b"\x2f" + vp8l_bits.to_bytes(4, "little")
    )
    got = parse_webp(vp8l)
    assert (got["width"], got["height"], got["decode_ok"]) == (17, 23, True)

    vp8x = (
        b"RIFF" + (4 + 8 + 10).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + (10).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (256 - 1).to_bytes(3, "little") + (128 - 1).to_bytes(3, "little")
    )
    got = parse_webp(vp8x)
    assert (got["width"], got["height"], got["decode_ok"]) == (256, 128, True)


def test_parse_webp_counts_anmf_by_chunk_walk_not_substring():
    # Two real ANMF sub-chunks whose payloads ALSO contain the literal
    # bytes b"ANMF" — a substring count would report 4 frames.
    anmf_payload = b"\x00" * 16 + b"ANMF" + b"\x00" * 4
    anmf = b"ANMF" + len(anmf_payload).to_bytes(4, "little") + anmf_payload
    body = (
        b"WEBP"
        + b"VP8X" + (10).to_bytes(4, "little")
        + b"\x02\x00\x00\x00"  # animation flag
        + (64 - 1).to_bytes(3, "little") + (32 - 1).to_bytes(3, "little")
        + anmf + anmf
    )
    vp8x = b"RIFF" + len(body).to_bytes(4, "little") + body
    got = parse_webp(vp8x)
    assert (got["width"], got["height"], got["n_frames"]) == (64, 32, 2)


def test_parse_wav_clamps_truncated_data_chunk():
    # Declared 1000 frames, payload truncated to 100 frames' bytes:
    # n_frames must reflect the decodable payload, not the header.
    full = make_wav(1000)  # mono PCM-16: block_align 2
    truncated = full[: len(full) - 900 * 2]
    got = parse_wav(truncated)
    assert got["decode_ok"] is True and got["n_frames"] == 100


def test_sniff_mime_ignores_declared_mime():
    assert sniff_mime(make_png(1, 1)) == "image/png"
    assert sniff_mime(make_jpeg(1, 1)) == "image/jpeg"
    assert sniff_mime(make_gif(1, 1)) == "image/gif"
    assert sniff_mime(make_bmp(1, 1)) == "image/bmp"
    assert sniff_mime(make_wav(1)) == "audio/wav"
    assert sniff_mime(b"not media") is None
    # header_codec trusts bytes, not labels: a PNG declared as JPEG
    # still parses as PNG.
    assert header_codec(make_png(5, 6), "image/jpeg")["width"] == 5


def test_header_codec_rejects_truncated_and_corrupt():
    assert header_codec(b"", "image/png")["decode_ok"] is False
    assert header_codec(make_png(9, 9)[:12], "")["decode_ok"] is False
    assert header_codec(b"\xff\xd8\xff\xd9", "")["decode_ok"] is False  # SOI+EOI only
    assert header_codec(b"GIF89a\x00\x00\x00\x00\x00\x00\x00", "")["decode_ok"] is False
    bad_wav = b"RIFF\x00\x00\x00\x00WAVEjunk"
    assert header_codec(bad_wav, "")["decode_ok"] is False


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


def test_resize_media_roundtrips_new_dimensions(spark):
    from tmdb_index_spark.operators.multimodal import decode_media, resize_media

    resized = resize_media(_media(spark), width=32, height=24)
    out = {
        r["media_id"]: (r["width"], r["height"], r["decode_ok"])
        for r in decode_media(resized).collect()
        if r["media"] is not None
    }
    # every surviving payload re-decodes at exactly the target dims
    assert out, "expected at least one resizable payload"
    assert all(v == (32, 24, True) for v in out.values())


def test_resize_media_nulls_unresizable_payloads(spark):
    import pandas as pd

    from tmdb_index_spark.operators.multimodal import resize_media

    rows = [
        (1, {"data": b"not an image at all", "mime": "text/plain",
             "source_uri": "m"}),
        (2, None),
    ]
    df = spark.createDataFrame(rows, _media(spark).schema)
    got = {r["media_id"]: r["media"] for r in resize_media(df, 8, 8).collect()}
    assert got[1] is None and got[2] is None


def test_resize_media_rejects_bad_dims(spark):
    import pytest

    from tmdb_index_spark.operators.multimodal import resize_media

    with pytest.raises(ValueError):
        resize_media(_media(spark), 0, 8)


def test_unavailable_resizer_raises_with_dependency_hint():
    import pytest

    from tmdb_index_spark.operators.multimodal import unavailable_resizer

    with pytest.raises(NotImplementedError, match="Pillow"):
        unavailable_resizer(b"x", "image/png", 8, 8)


# ---- opt-in: REAL pixel path through the injectable seams ------------------
# The container ships no image libraries (TESTDATA/brief contract), so
# these skip cleanly here; on any machine with Pillow they prove the
# production wiring — a real decoder in decode_media's codec seam, a
# real resizer in resize_media's — and cross-validate the stdlib
# make_png synthesizer against a real decoder.


def test_pillow_roundtrip_through_codec_and_resizer_seams(spark):
    Image = pytest.importorskip("PIL.Image", reason="Pillow not installed")
    import io

    from tmdb_index_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )

    # our stdlib-synthesized PNG must be readable by a REAL decoder
    with Image.open(io.BytesIO(make_png(320, 200))) as im:
        assert im.size == (320, 200)

    def pillow_codec(data: bytes, mime: str) -> dict:
        if not data or not mime.startswith("image/"):
            return {
                "width": None, "height": None,
                "n_frames": None, "decode_ok": False,
            }
        try:
            with Image.open(io.BytesIO(data)) as im:
                return {
                    "width": im.size[0], "height": im.size[1],
                    "n_frames": getattr(im, "n_frames", 1),
                    "decode_ok": True,
                }
        except Exception:
            return {
                "width": None, "height": None,
                "n_frames": None, "decode_ok": False,
            }

    def pillow_resizer(data, mime, w, h):
        if not data:
            return None
        try:
            with Image.open(io.BytesIO(data)) as im:
                buf = io.BytesIO()
                im.resize((w, h)).save(buf, format=im.format or "PNG")
                return buf.getvalue()
        except Exception:
            return None

    imgs = _media(spark).filter("media_id = 0")
    resized = resize_media(imgs, 64, 48, resizer=pillow_resizer)
    out = decode_media(resized, codec=pillow_codec).collect()
    assert len(out) == 1
    assert (out[0]["width"], out[0]["height"]) == (64, 48)
    assert out[0]["decode_ok"]
