"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (beyond-reference scope).

Media travel as opaque ``binary`` columns with typed metadata; compute
happens in Arrow-batched ``mapInPandas`` stages so bytes never round-
trip row-at-a-time through Python. The heavy codecs (PIL/ffmpeg/...)
are NOT in this container, so the decode step is gated: if a real
decoder import fails, a clearly-marked deterministic FAKE decoder
handles the synthetic ``FAKE`` container format below — the Spark-side
plumbing (schemas, UDF signatures, batch shapes, partitioning) is real
and tested either way.

Synthetic container format (used by fixtures and the fake decoder):
``b"FAKE" + width:uint16-be + height:uint16-be + payload`` where the
payload is width*height bytes (one 8-bit channel). "Video" is a
concatenation of such frames.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKE"
HEADER_LEN = 8

try:  # real decoder, if the environment has one
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def media_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Cheap native metadata — no decode: byte size and a sha256
    content hash (dedup key for exact binary duplicates). Stays
    JVM-side; safe at any scale."""
    return df.select(
        F.col(id_col),
        F.length(F.col(bin_col)).alias("n_bytes"),
        F.sha2(F.col(bin_col), 256).alias("content_sha256"),
    )


def _parse_header(b: bytes) -> tuple[int, int]:
    if b is None or len(b) < HEADER_LEN or b[:4] != MAGIC:
        raise ValueError("not a FAKE container")
    w, h = struct.unpack(">HH", b[4:8])
    return w, h


IMAGE_META_SCHEMA = "id long, width int, height int, n_pixels long, mean_intensity double"


def decode_image_meta(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Decode + feature-extract per image: (width, height, n_pixels,
    mean intensity). Arrow-batched mapInPandas — one Python roundtrip
    per BATCH of images, not per image.

    Real image formats require a decoder library; absent one, only the
    synthetic FAKE format is supported and anything else raises
    NotImplementedError (clearly a stub, never silently wrong).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                if b[:4] == MAGIC:
                    w, h = _parse_header(b)
                    payload = b[HEADER_LEN : HEADER_LEN + w * h]
                    mean = (sum(payload) / len(payload)) if payload else 0.0
                elif _HAVE_PIL:
                    raise NotImplementedError(
                        "real image decode path not wired in this build"
                    )
                else:
                    raise NotImplementedError(
                        "no image decoder available in this environment; "
                        "only the synthetic FAKE format is supported"
                    )
                out.append(
                    {
                        "id": rid,
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        "mean_intensity": float(mean),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "width", "height", "n_pixels", "mean_intensity"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


FRAME_SCHEMA = "id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame, bin_col: str, id_col: str, every_n: int = 2
) -> DataFrame:
    """Frame sampling for 'video' blobs: split the payload into frames
    (each its own FAKE container), keep every n-th. One input row fans
    out to ceil(frames / every_n) output rows — mapInPandas because the
    fan-out is data-dependent (an explode over a decoded structure)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                pos, idx = 0, 0
                while pos + HEADER_LEN <= len(b) and b[pos : pos + 4] == MAGIC:
                    w, h = struct.unpack(">HH", b[pos + 4 : pos + 8])
                    end = pos + HEADER_LEN + w * h
                    if idx % every_n == 0:
                        out.append(
                            {"id": rid, "frame_idx": idx, "frame": b[pos:end]}
                        )
                    pos, idx = end, idx + 1
            yield pd.DataFrame(out, columns=["id", "frame_idx", "frame"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, FRAME_SCHEMA
    )


def make_fake_image(width: int, height: int, fill: int) -> bytes:
    """Fixture helper: one FAKE container with constant intensity."""
    return MAGIC + struct.pack(">HH", width, height) + bytes([fill]) * (width * height)
