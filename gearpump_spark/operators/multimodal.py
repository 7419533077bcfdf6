"""Multimodal columns: image/audio/video as opaque BinaryType payloads with
typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the actual byte decoding is
STUBBED: `FakeDecoder` derives deterministic pseudo-metadata/pixels from the
payload's md5 (stable across runs/engines), and `LibraryDecoder` raises
NotImplementedError with the dependency it would need. Everything
Spark-side — schema, batch iteration, partitioning, UDF signatures — is
real and tested; swapping in PIL/ffmpeg later changes only the decoder
object.

Scale notes: decode work is embarrassingly parallel per partition; batches
stream through Arrow (never a whole partition in memory at once). Payload
columns stay out of shuffles — all operators here are narrow maps; any
downstream grouping should key on doc_id/metadata, not bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, byte_len bigint, format string, width int, height int, n_channels int"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"

RESIZE_SCHEMA = "doc_id bigint, payload binary, width int, height int, byte_len bigint"

FEATURE_SCHEMA = "doc_id bigint, features array<float>"


def attach_fake_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Deterministic stand-in binary payload (UTF-8 bytes of the text);
    real pipelines read bytes from parquet/object storage directly."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


class LibraryDecoder:
    """The real-decoder seam. Not available in this environment."""

    def decode_image(self, payload: bytes):
        raise NotImplementedError(
            "image decoding requires PIL/opencv, which are not installed; "
            "use FakeDecoder for plumbing tests"
        )

    def sample_frames(self, payload: bytes, n: int):
        raise NotImplementedError("video decoding requires ffmpeg/av, not installed")

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        raise NotImplementedError("image resize requires PIL/opencv, not installed")

    def features(self, payload: bytes, dim: int):
        raise NotImplementedError(
            "feature extraction requires a vision/audio model runtime, not installed"
        )


class FakeDecoder:
    """Deterministic pseudo-decoder: metadata derived from md5(payload).
    Stable across runs, engines, and partitionings — good enough to test
    schema/partition/batch behavior end-to-end."""

    FORMATS = ("png", "jpeg", "webp")

    def decode_image(self, payload: bytes):
        h = hashlib.md5(payload).digest()
        return {
            "format": self.FORMATS[h[0] % len(self.FORMATS)],
            "width": 16 + h[1] * 4,
            "height": 16 + h[2] * 4,
            "n_channels": 1 + h[3] % 4,
        }

    def sample_frames(self, payload: bytes, n: int):
        # 4-byte index: bytes([i]) would overflow past i=255
        return [
            hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest() for i in range(n)
        ]

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        # Output bytes scale with the target raster (3 bytes/px, like an
        # uncompressed RGB bitmap) so size accounting behaves like a real
        # resize; content = md5 keystream seeded by payload + dims.
        # Running byte counter: re-summing the block list per iteration
        # would be quadratic in the raster size (hours for one 1080p image).
        seed = hashlib.md5(payload + f"|{width}x{height}".encode()).digest()
        need = width * height * 3
        blocks = [seed]
        have = len(seed)
        while have < need:
            blocks.append(hashlib.md5(blocks[-1]).digest())
            have += len(blocks[-1])
        return b"".join(blocks)[:need]

    def features(self, payload: bytes, dim: int):
        # One float in [0, 1) per dimension from md5(payload + dim index);
        # 4-byte index so dims > 255 work.
        return [
            int.from_bytes(hashlib.md5(payload + i.to_bytes(4, "big")).digest()[:4], "big")
            / 2**32
            for i in range(dim)
        ]


def decode_image_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", decoder=None
) -> DataFrame:
    """Extract image metadata per payload via mapInPandas (Arrow batches)."""
    decoder = decoder or FakeDecoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder.decode_image(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "byte_len": [len(bytes(p)) for p in pdf[payload_col]],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_channels": [m["n_channels"] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, IMAGE_META_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder=None,
) -> DataFrame:
    """Resize every image payload to (width, height); returns the new
    binary payload plus dims. Narrow map — no shuffle; resized bytes are
    written straight to the sink partition that holds the input row."""
    decoder = decoder or FakeDecoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [decoder.resize(bytes(p), width, height) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": out,
                    "width": width,
                    "height": height,
                    "byte_len": [len(b) for b in out],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, RESIZE_SCHEMA)


def extract_features(
    df: DataFrame,
    dim: int = 8,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder=None,
) -> DataFrame:
    """Feature extraction: payload → dense float vector (the embedding
    column the similarity operators consume). Real pipelines put a model
    forward pass behind the decoder seam; batch size stays Arrow-bounded so
    accelerator batching maps 1:1 onto these pandas batches."""
    decoder = decoder or FakeDecoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "features": [
                        decoder.features(bytes(p), dim) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames: int = 3,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder=None,
) -> DataFrame:
    """Frame sampling: one output row per (payload, frame index)."""
    decoder = decoder or FakeDecoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                for j, fh in enumerate(decoder.sample_frames(bytes(p), n_frames)):
                    ids.append(i)
                    idxs.append(j)
                    hashes.append(fh)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.select(id_col, payload_col).mapInPandas(op, FRAME_SCHEMA)
