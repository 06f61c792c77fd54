"""Multimodal column conventions + decode/feature plumbing.

Images / audio / video ride through the engine as opaque ``binary``
columns with a typed metadata struct next to them — the same convention
big training-data pipelines use so that relational pruning (filters on
metadata) happens WITHOUT touching the payload bytes:

    media struct<
        data:       binary,       -- opaque payload
        mime:       string,       -- 'image/png', 'audio/wav', ...
        source_uri: string
    >

The decode / feature-extract / resize / frame-sample operators run as
Arrow-batched ``mapInPandas`` stages: the Spark-side plumbing (schemas,
batch iteration, partition parallelism, column pruning) is real and
tested; the codec itself is injectable. The default is
:func:`~tmdb_index_spark.operators.media_codec.header_codec` — a real
stdlib-only parser of PNG/JPEG/GIF/BMP/WebP/WAV headers (format sniff,
dimensions, frame count). Alternatives:

* :func:`fake_codec` — a deterministic stand-in that derives metadata
  from a payload hash (for plumbing benchmarks on arbitrary bytes), or
* :func:`unavailable_codec` — raises ``NotImplementedError`` with the
  dependency name; inject Pillow/torchaudio/PyAV through the same seam
  for full pixel/sample decode without touching the Spark plumbing.

Scale notes (100 TB): payload bytes dominate — the operators must never
shuffle them. Everything here is a map-only stage; downstream joins
should carry ``media_id`` and re-attach payloads with a final
co-partitioned join. ``spark.sql.files.maxPartitionBytes`` (not row
count) governs scan parallelism for binary-heavy tables; Arrow batches
of default 10k rows would blow executor memory at ~1 MB/payload, so
callers with big blobs should lower
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tmdb_index_spark.operators.media_codec import header_codec

__all__ = [
    "MEDIA_STRUCT",
    "DECODED_FIELDS",
    "fake_codec",
    "header_codec",
    "unavailable_codec",
    "decode_media",
    "media_features",
    "sample_frames",
    "resize_media",
    "fake_resizer",
    "unavailable_resizer",
]

#: The media column convention (see module docstring).
MEDIA_STRUCT = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

#: Columns appended by :func:`decode_media`.
DECODED_FIELDS = T.StructType(
    [
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

#: A codec maps (payload bytes, mime) -> dict of DECODED_FIELDS values.
Codec = Callable[[bytes, str], dict[str, Any]]


def fake_codec(data: bytes, mime: str) -> dict[str, Any]:
    """Deterministic decode stand-in: metadata derived from a stable
    hash of the payload. Not a real decoder — it exists so the Spark
    plumbing is exercisable and benchmarkable in codec-less
    environments."""
    if not data:
        return {"width": None, "height": None, "n_frames": None, "decode_ok": False}
    h = hashlib.md5(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if mime.startswith("image/") else 1 + h[2] % 300
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "decode_ok": True,
    }


def unavailable_codec(data: bytes, mime: str) -> dict[str, Any]:
    """The full-decode stub: pixel/sample decoding requires an
    image/audio library not present in this environment (header parsing
    does not — see :func:`header_codec`)."""
    raise NotImplementedError(
        f"no codec available for {mime!r}: install Pillow (image/*), "
        "torchaudio (audio/*) or PyAV (video/*) and inject it as "
        "decode_media(..., codec=...)"
    )


def decode_media(
    df: DataFrame,
    media_col: str = "media",
    codec: Codec = header_codec,
) -> DataFrame:
    """Append :data:`DECODED_FIELDS` by running ``codec`` over every
    payload in Arrow-batched ``mapInPandas``. Map-only: no shuffle, and
    payload bytes never leave their partition."""
    out_schema = T.StructType(df.schema.fields + list(DECODED_FIELDS.fields))
    field_names = [f.name for f in DECODED_FIELDS.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                codec(m["data"], m["mime"] or "")
                if m is not None
                else {k: None for k in field_names}
                for m in pdf[media_col]
            ]
            for k in field_names:
                pdf[k] = [r[k] for r in meta]
            yield pdf

    return df.mapInPandas(run, out_schema)


def media_features(
    df: DataFrame,
    media_col: str = "media",
    dim: int = 16,
) -> DataFrame:
    """Append a deterministic ``array<float>`` feature vector per
    payload (hash-derived stand-in for a real encoder). Same plumbing a
    CLIP/wav2vec embedding stage uses: Arrow batches in, fixed-dim float
    arrays out, map-only."""
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                if m is None or not m["data"]:
                    feats.append(None)
                    continue
                h = hashlib.sha256(m["data"]).digest()
                feats.append(
                    [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(dim)]
                )
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 30,
    n_frames_col: str = "n_frames",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index
    (0, every_n, 2·every_n, …). Pure built-in expressions — the frame
    EXTRACTION belongs to a codec stage downstream; this computes which
    frames to extract, so the explode happens before any pixel bytes
    exist."""
    idx = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
            F.lit(every_n),
        )
    )
    return df.filter(F.col(n_frames_col).isNotNull()).select(
        F.col(id_col), idx.alias("frame_idx")
    )


#: A resizer takes (payload, mime, target_w, target_h) and returns the
#: resized payload bytes, or None when the payload can't be resized
#: (undecodable, non-image mime). Inject Pillow here in production.
Resizer = Callable[[bytes, str, int, int], "bytes | None"]


def fake_resizer(data: bytes, mime: str, w: int, h: int) -> bytes | None:
    """Deterministic stand-in resizer (the container ships no pixel
    libraries — TESTDATA/brief contract): emits a syntactically valid
    payload of the SAME container format at the target dimensions,
    using the stdlib synthesizers in `operators/media_codec.py`, so a
    downstream :func:`decode_media` round-trips the new width/height.
    Non-image or unsniffable payloads resize to None — the same
    contract a real decoder failure produces."""
    from tmdb_index_spark.operators import media_codec as mc

    kind = mc.sniff_mime(data)
    if kind is None or not kind.startswith("image/"):
        return None
    maker = {
        "image/png": mc.make_png,
        "image/jpeg": mc.make_jpeg,
        "image/gif": mc.make_gif,
        "image/bmp": mc.make_bmp,
        # no stdlib webp synthesizer: the stand-in resizes webp to None
    }.get(kind)
    return maker(w, h) if maker else None


def unavailable_resizer(data: bytes, mime: str, w: int, h: int) -> bytes:
    """Production seam for a real pixel path."""
    raise NotImplementedError(
        "pixel resizing needs an image library: install Pillow and "
        "inject it as resize_media(..., resizer=...)"
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    resizer: Resizer = fake_resizer,
) -> DataFrame:
    """Rewrite each media payload to ``width``×``height`` via the
    injected ``resizer``, preserving the media struct shape (payload
    replaced, mime/uri kept) so the resized column drops into every
    downstream stage unchanged — a following :func:`decode_media`
    reports the new dimensions from the rewritten container headers.
    Arrow-batched ``mapInPandas``, map-only: payload bytes never cross
    a shuffle, batch memory is bounded by the same
    ``arrow.maxRecordsPerBatch`` note as the module docstring. Payloads
    the resizer returns ``None`` for surface as NULL media (the
    caller's quality filter decides their fate), mirroring decode
    failure semantics."""
    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                if m is None or m["data"] is None:
                    out.append(None)
                    continue
                resized = resizer(m["data"], m["mime"] or "", width, height)
                if resized is None:
                    out.append(None)
                    continue
                nm = dict(m)
                nm["data"] = resized
                out.append(nm)
            pdf[media_col] = out
            yield pdf

    return df.mapInPandas(run, out_schema)
