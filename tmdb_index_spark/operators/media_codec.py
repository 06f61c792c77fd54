"""Stdlib-only media header codec: real byte-level parsing of image and
audio container headers (PNG / APNG, JPEG, GIF, BMP, WebP, WAV).

This replaces the round-1 ``unavailable_codec`` stub as the default
decode path: format sniffing and dimension / frame-count extraction need
no external library — they are pure header arithmetic over the payload
bytes, exactly what a 100 TB metadata-pruning pass wants (touch the
first ~kB of each blob, never decode pixels). Full pixel decode still
belongs to an injected Pillow/PyAV codec via ``decode_media(...,
codec=...)`` — the injection seam is unchanged.

Format references (public specs):
- PNG:  https://www.w3.org/TR/png-3/  (signature, IHDR, acTL for APNG)
- JPEG: ITU-T T.81 §B (marker segments; SOFn carries dimensions)
- GIF:  GIF89a specification (logical screen descriptor, block walk)
- BMP:  BITMAPINFOHEADER / BITMAPCOREHEADER layouts
- WebP: RIFF container; VP8 / VP8L / VP8X chunk layouts
- WAV:  RIFF 'fmt ' + 'data' chunks

Each parser returns ``{"width", "height", "n_frames", "decode_ok"}``
(the :data:`~tmdb_index_spark.operators.multimodal.DECODED_FIELDS`
contract) and degrades to ``decode_ok=False`` on truncated or
malformed input — corrupt blobs must filter, not kill a 1000-executor
stage.

The ``make_*`` synthesizers build minimal spec-valid files with known
header values. They exist for tests and for the ``media_decode``
catalog query, whose DuckDB oracle recomputes the expected dimensions
arithmetically — so a synth/parse bug that didn't cancel bit-for-bit
fails the driver gate.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

__all__ = [
    "sniff_mime",
    "header_codec",
    "parse_png",
    "parse_jpeg",
    "parse_gif",
    "parse_bmp",
    "parse_webp",
    "parse_wav",
    "make_png",
    "make_gif",
    "make_jpeg",
    "make_bmp",
    "make_wav",
]

_FAIL: dict[str, Any] = {
    "width": None,
    "height": None,
    "n_frames": None,
    "decode_ok": False,
}


def _ok(width: int | None, height: int | None, n_frames: int) -> dict[str, Any]:
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "decode_ok": True,
    }


def sniff_mime(data: bytes) -> str | None:
    """Container sniff from magic bytes — never trusts a declared mime
    (upstream metadata lies at corpus scale)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:2] == b"\xff\xd8":
        return "image/jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "image/webp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    return None


# ---------------------------------------------------------------------------
# Parsers
# ---------------------------------------------------------------------------


def parse_png(data: bytes) -> dict[str, Any]:
    """IHDR must be the first chunk: width/height are big-endian u32 at
    bytes 16..24. APNG's ``acTL`` chunk (if present before IDAT)
    carries the animation frame count."""
    if len(data) < 24 or data[12:16] != b"IHDR":
        return dict(_FAIL)
    width, height = struct.unpack(">II", data[16:24])
    if width == 0 or height == 0:
        return dict(_FAIL)
    n_frames = 1
    # Walk chunks looking for acTL (APNG). Stop at IDAT — acTL is
    # required to precede it.
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"acTL" and pos + 12 <= len(data):
            (n_frames,) = struct.unpack(">I", data[pos + 8 : pos + 12])
            break
        if ctype in (b"IDAT", b"IEND"):
            break
        pos += 12 + length  # len + type + payload + crc
    return _ok(width, height, max(n_frames, 1))


_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def parse_jpeg(data: bytes) -> dict[str, Any]:
    """Marker walk: skip segments until an SOFn frame header, which
    stores (precision u8, height u16be, width u16be) in its payload."""
    if data[:2] != b"\xff\xd8":
        return dict(_FAIL)
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return dict(_FAIL)
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return dict(_FAIL)
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seg_len < 2:
            return dict(_FAIL)
        if marker in _JPEG_SOF:
            if pos + 9 > len(data):
                return dict(_FAIL)
            height, width = struct.unpack(">HH", data[pos + 5 : pos + 9])
            if width == 0 or height == 0:
                return dict(_FAIL)
            return _ok(width, height, 1)
        pos += 2 + seg_len
    return dict(_FAIL)


def parse_gif(data: bytes) -> dict[str, Any]:
    """Logical-screen width/height are little-endian u16 at bytes 6..10;
    the frame count is the number of image-descriptor (0x2C) blocks in
    a full block walk."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return dict(_FAIL)
    width, height = struct.unpack("<HH", data[6:10])
    if width == 0 or height == 0:
        return dict(_FAIL)
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0

    def _skip_subblocks(p: int) -> int:
        while p < len(data):
            size = data[p]
            p += 1
            if size == 0:
                return p
            p += size
        return p

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte then sub-blocks
            pos = _skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor
            n_frames += 1
            if pos + 10 > len(data):
                return dict(_FAIL)
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x80:  # local color table
                pos += 3 * (2 << (iflags & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(pos)
        else:
            return dict(_FAIL)
    if n_frames == 0:
        return dict(_FAIL)
    return _ok(width, height, n_frames)


def parse_bmp(data: bytes) -> dict[str, Any]:
    """DIB-header dispatch: BITMAPCOREHEADER (size 12, u16 dims) vs the
    BITMAPINFOHEADER family (i32 dims; height sign encodes row
    order)."""
    if data[:2] != b"BM" or len(data) < 26:
        return dict(_FAIL)
    (dib_size,) = struct.unpack("<I", data[14:18])
    if dib_size == 12:
        width, height = struct.unpack("<HH", data[18:22])
    elif dib_size >= 40:
        width, height = struct.unpack("<ii", data[18:26])
        height = abs(height)
    else:
        return dict(_FAIL)
    if width <= 0 or height == 0:
        return dict(_FAIL)
    return _ok(width, height, 1)


def parse_webp(data: bytes) -> dict[str, Any]:
    """First RIFF chunk decides the layout: 'VP8 ' (lossy bitstream),
    'VP8L' (lossless, 14-bit packed dims), or 'VP8X' (extended, u24
    dims-minus-one; ANMF sub-chunks counted as frames)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP" or len(data) < 20:
        return dict(_FAIL)
    fourcc = data[12:16]
    payload = data[20:]
    if fourcc == b"VP8 ":
        # key-frame start code 9D 01 2A, then u16le dims (14 bits used)
        if len(payload) < 10 or payload[3:6] != b"\x9d\x01\x2a":
            return dict(_FAIL)
        (width,) = struct.unpack("<H", payload[6:8])
        (height,) = struct.unpack("<H", payload[8:10])
        return _ok(width & 0x3FFF, height & 0x3FFF, 1)
    if fourcc == b"VP8L":
        if len(payload) < 5 or payload[0] != 0x2F:
            return dict(_FAIL)
        (bits,) = struct.unpack("<I", payload[1:5])
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
        return _ok(width, height, 1)
    if fourcc == b"VP8X":
        if len(payload) < 10:
            return dict(_FAIL)
        width = int.from_bytes(payload[4:7], "little") + 1
        height = int.from_bytes(payload[7:10], "little") + 1
        # Count ANMF frames by walking RIFF sub-chunk headers — a raw
        # substring count would also match the byte pattern inside
        # compressed frame payloads.
        n_frames = 0
        (vp8x_size,) = struct.unpack("<I", data[16:20])
        pos = 20 + vp8x_size + (vp8x_size & 1)
        while pos + 8 <= len(data):
            sub = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if sub == b"ANMF":
                n_frames += 1
            pos += 8 + size + (size & 1)
        return _ok(width, height, max(n_frames, 1))
    return dict(_FAIL)


def parse_wav(data: bytes) -> dict[str, Any]:
    """RIFF chunk walk: 'fmt ' gives block_align, 'data' gives payload
    size; ``n_frames`` is the PCM sample-frame count
    (data_size / block_align)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return dict(_FAIL)
    pos = 12
    block_align = None
    data_size = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"fmt " and pos + 22 <= len(data):
            (block_align,) = struct.unpack("<H", data[pos + 20 : pos + 22])
        elif fourcc == b"data":
            # Clamp to the bytes actually present: a truncated file may
            # declare more samples than it carries, and the frame count
            # must reflect the decodable payload.
            data_size = min(size, max(len(data) - pos - 8, 0))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not block_align or data_size is None:
        return dict(_FAIL)
    return _ok(None, None, data_size // block_align)


_PARSERS = {
    "image/png": parse_png,
    "image/jpeg": parse_jpeg,
    "image/gif": parse_gif,
    "image/bmp": parse_bmp,
    "image/webp": parse_webp,
    "audio/wav": parse_wav,
}


def header_codec(data: bytes, mime: str) -> dict[str, Any]:
    """The real default codec: sniff the container from magic bytes
    (the declared ``mime`` is ignored — corpus metadata lies), then
    parse dimensions / frame count from the header. Satisfies the
    ``Codec`` contract of
    :func:`~tmdb_index_spark.operators.multimodal.decode_media`."""
    if not data:
        return dict(_FAIL)
    sniffed = sniff_mime(data)
    if sniffed is None:
        return dict(_FAIL)
    return _PARSERS[sniffed](data)


# ---------------------------------------------------------------------------
# Synthesizers (tests + oracle-backed catalog fixtures)
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int) -> bytes:
    """Minimal fully-valid 8-bit grayscale PNG (real zlib IDAT, real
    CRCs)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int, n_frames: int = 1) -> bytes:
    """Minimal block-structurally-valid GIF89a with ``n_frames`` image
    descriptors and a 2-entry global color table."""
    out = [
        b"GIF89a",
        struct.pack("<HH", width, height),
        bytes([0x80, 0x00, 0x00]),  # GCT present, 2 entries
        b"\x00\x00\x00\xff\xff\xff",  # global color table
    ]
    for _ in range(n_frames):
        out.append(b"\x2c")  # image descriptor
        out.append(struct.pack("<HHHH", 0, 0, width, height))
        out.append(b"\x00")  # no local color table
        out.append(b"\x02")  # LZW minimum code size
        out.append(b"\x02\x44\x01\x00")  # one 2-byte sub-block + terminator
    out.append(b"\x3b")
    return b"".join(out)


def make_jpeg(width: int, height: int) -> bytes:
    """Header-valid JPEG: SOI + JFIF APP0 + quant table + SOF0 carrying
    the dimensions + EOI."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + b"\x10" * 64
    sof0 = (
        struct.pack(">BHH", 8, height, width)
        + b"\x03"
        + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )


def make_bmp(width: int, height: int) -> bytes:
    """BITMAPINFOHEADER BMP with a zero-filled 24-bpp pixel array."""
    row = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    pixels = b"\x00" * (row * height)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    )
    return header + pixels


def make_wav(n_samples: int, sample_rate: int = 16_000, channels: int = 1) -> bytes:
    """PCM-16 WAV with ``n_samples`` zero sample-frames."""
    block_align = channels * 2
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
