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


def attach_fake_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> Column:
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
        return [hashlib.md5(payload + bytes([i])).hexdigest() for i in range(n)]


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
