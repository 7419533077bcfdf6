"""HeaderDecoder goldens: handcrafted container bytes with KNOWN metadata,
decoded by the pure-python header parsers (VERDICT.md round-1 item #5 —
"un-stub one multimodal decoder path"). Fixtures are built field-by-field
from the published container specs, so a parser bug can't cancel a fixture
bug. The PNG fixture is a fully valid file (zlib IDAT + correct CRCs), the
others are spec-minimal headers.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from gearpump_spark.operators.multimodal import (
    FakeDecoder,
    HeaderDecoder,
    decode_audio_metadata,
    decode_image_metadata,
)


def make_png(width: int, height: int, color_type: int = 6, bit_depth: int = 8) -> bytes:
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(
        b"\x00" + bytes(width * channels * (bit_depth // 8)) for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    row = (width * (bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    pixels = bytes(row * abs(height))
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(pixels), 2835, 2835, 0, 0)
    )
    return header + pixels


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def make_jpeg(width: int, height: int, n_channels: int = 3) -> bytes:
    # APP0 length 16 = 2 (length field) + 14 body bytes (id 5, version 2,
    # units 1, density 4, thumbnail 2)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + bytes(6)
    sof0_body = struct.pack(">BHHB", 8, height, width, n_channels) + bytes(3 * n_channels)
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof0_body)) + sof0_body
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_wav(n_channels: int, sample_rate: int, bits: int, n_samples: int = 4) -> bytes:
    block_align = n_channels * bits // 8
    data = bytes(n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


D = HeaderDecoder()


def test_png_header_golden():
    meta = D.decode_image(make_png(640, 480, color_type=6))
    assert meta == {"format": "png", "width": 640, "height": 480, "n_channels": 4}
    gray = D.decode_image(make_png(7, 3, color_type=0))
    assert (gray["width"], gray["height"], gray["n_channels"]) == (7, 3, 1)


def test_bmp_header_golden():
    meta = D.decode_image(make_bmp(31, 17, bpp=24))
    assert meta == {"format": "bmp", "width": 31, "height": 17, "n_channels": 3}
    # negative height = top-down bitmap; reported size is positive
    assert D.decode_image(make_bmp(8, -4, bpp=32))["height"] == 4


def test_gif_and_jpeg_header_golden():
    assert D.decode_image(make_gif(320, 200)) == {
        "format": "gif", "width": 320, "height": 200, "n_channels": 3,
    }
    meta = D.decode_image(make_jpeg(1024, 768, n_channels=3))
    assert meta == {"format": "jpeg", "width": 1024, "height": 768, "n_channels": 3}


def test_wav_header_golden():
    meta = D.decode_audio(make_wav(2, 44100, 16))
    assert meta == {
        "format": "wav", "n_channels": 2, "sample_rate": 44100, "bits_per_sample": 16,
    }
    with pytest.raises(ValueError):
        D.decode_audio(b"not audio at all")


def test_unrecognized_bytes_fall_back_to_fake():
    payload = b"just some text bytes"
    assert D.decode_image(payload) == FakeDecoder().decode_image(payload)
    assert D.sniff_image(payload) is None
    assert D.sniff_audio(payload) is None


def test_truncated_containers_never_raise():
    for fx in (make_png(4, 4), make_bmp(4, 4), make_jpeg(4, 4), make_wav(1, 8000, 8)):
        for cut in (0, 1, 2, 6, 10, 14, 20):
            D.sniff_image(fx[:cut])
            D.sniff_audio(fx[:cut])


def test_decode_image_metadata_real_containers_end_to_end(spark):
    rows = [
        (1, bytearray(make_png(12, 34))),
        (2, bytearray(make_bmp(56, 78))),
        (3, bytearray(make_jpeg(90, 12))),
        (4, bytearray(b"opaque non-container bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in decode_image_metadata(df).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("png", 12, 34)
    assert (out[2].format, out[2].width, out[2].height) == ("bmp", 56, 78)
    assert (out[3].format, out[3].width, out[3].height) == ("jpeg", 90, 12)
    assert out[4].format in FakeDecoder.FORMATS  # fallback path
    assert out[1].byte_len == len(make_png(12, 34))


def test_decode_audio_metadata_end_to_end(spark):
    rows = [
        (1, bytearray(make_wav(1, 16000, 16))),
        (2, bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in decode_audio_metadata(df).collect()}
    assert (out[1].format, out[1].n_channels, out[1].sample_rate) == ("wav", 1, 16000)
    assert out[2].format is None
