"""Codec-boundary tests for the multimodal operators: the real-mode
decode path (PIL when importable, pure-stdlib header sniffing for
PNG/GIF/JPEG otherwise) and the documented NotImplementedError limit for
unknown formats without a codec library."""

from __future__ import annotations

import struct
import zlib

import pytest


def _png_bytes(width: int, height: int) -> bytes:
    """Minimal valid 8-bit RGB PNG built with stdlib only."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * (3 * width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def _jpeg_bytes(width: int, height: int) -> bytes:
    """SOI + APP0 + SOF0 + EOI — enough of a JPEG for header walking."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_sniff_dimensions_formats():
    from cioos_siooc_data_transform_spark.operators.multimodal import (
        _sniff_dimensions,
    )

    assert _sniff_dimensions(_png_bytes(17, 9)) == (17, 9)
    assert _sniff_dimensions(_gif_bytes(320, 200)) == (320, 200)
    assert _sniff_dimensions(_jpeg_bytes(640, 480)) == (640, 480)
    assert _sniff_dimensions(b"not an image at all") is None


def test_decode_real_mode_header_fallback():
    from cioos_siooc_data_transform_spark.operators.multimodal import (
        decode_image_stub,
    )

    assert decode_image_stub(_png_bytes(33, 21), fake=False) == (33, 21)
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x00\x01unknown", fake=False)


def test_extract_features_real_mode_end_to_end(spark):
    """The SAME mapInPandas body runs real decodes when fake_decode=False:
    synthesized PNG payloads flow through Arrow batches and come back
    with their true header dimensions."""
    import hashlib

    from cioos_siooc_data_transform_spark.operators.multimodal import (
        extract_features,
    )

    payloads = {1: _png_bytes(20, 10), 2: _png_bytes(7, 7), 3: _gif_bytes(64, 48)}
    media = spark.createDataFrame(
        [
            (doc_id, "image/png", bytearray(b), ("image/png", len(b), "synth"))
            for doc_id, b in payloads.items()
        ],
        "doc_id long, media_type string, payload binary, "
        "meta struct<mime:string, n_bytes:long, source:string>",
    )
    rows = {r["doc_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_pixels"]) == (20, 10, 200)
    assert (rows[2]["width"], rows[2]["height"]) == (7, 7)
    assert (rows[3]["width"], rows[3]["height"]) == (64, 48)
    for doc_id, b in payloads.items():
        assert rows[doc_id]["checksum"] == hashlib.md5(b).hexdigest()


def test_decode_pil_branch():
    """When PIL exists, the full-decode branch is preferred; synthesized
    PNG bytes round-trip through Image.open."""
    pytest.importorskip("PIL")
    from cioos_siooc_data_transform_spark.operators.multimodal import (
        decode_image_stub,
    )

    assert decode_image_stub(_png_bytes(12, 34), fake=False) == (12, 34)
