"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

Engine charter operators (no reference counterpart). The decode step is
STUBBED — image/audio codecs are not installed in this environment — but
everything Spark-side is real and tested: schema, batch shape, mapInPandas
signature, partition sizing. Swap ``_decode_stub`` for a PIL/libav call
and nothing else changes.

Scale notes: binary payloads ride the scan (binaryFile / parquet binary
column); mapInPandas streams Arrow record batches, so executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x mean blob
size — set it per modality (e.g. 64 for 4K video frames, 1024 for
thumbnails). Feature extraction emits small fixed-width vectors, so the
post-decode DataFrame is orders of magnitude lighter than the input; do
decode+extract in ONE pass to avoid re-shuffling blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def _decode_stub(content: bytes | None, kind: str) -> np.ndarray:
    """Deterministic fake 'decode + feature extract'.

    Real implementation: PIL.Image.open / soundfile / pyav frame sample,
    then a model forward pass. The stub derives FEATURE_DIM floats from
    the sha256 of the payload so tests are stable and collisions
    meaningful. Raises on None like a real decoder would.
    """
    if content is None:
        raise NotImplementedError("no payload to decode")
    digest = hashlib.sha256(content).digest()
    return np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint8).astype(
        np.float64
    )[:FEATURE_DIM] / 255.0


def extract_features(
    media: DataFrame, out_col: str = "features"
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> media_id, kind, features array<double>,
    decode_error string (null on success).

    One mapInPandas pass: decode never leaves the scan stage, blobs are
    dropped before any shuffle.
    """
    schema = (
        "media_id string, kind string, features array<double>, decode_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                try:
                    feats.append(_decode_stub(content, kind).tolist())
                    errs.append(None)
                except Exception as e:  # error channel, not task failure
                    feats.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(run, schema=schema)


def resize_images(
    media: DataFrame, width: int, height: int, out_col: str = "resized"
) -> DataFrame:
    """Image resize plumbing: mapInPandas pass emitting the (stubbed)
    resized payload + updated dims. The stub truncates/pads the payload
    deterministically to width*height bytes; a real build swaps in
    PIL.Image.resize and the schema/batching stay identical.
    """
    schema = (
        "media_id string, kind string, resized binary, "
        "out_width int, out_height int, decode_error string"
    )
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errs = [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                try:
                    if content is None:
                        raise NotImplementedError("no payload to decode")
                    if kind != "image":
                        raise ValueError(f"cannot resize kind={kind}")
                    raw = bytes(content)
                    out = (raw * (target // max(len(raw), 1) + 1))[:target]
                    payloads.append(out)
                    errs.append(None)
                except Exception as e:
                    payloads.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "resized": payloads,
                    "out_width": width,
                    "out_height": height,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(run, schema=schema).withColumnRenamed(
        "resized", out_col
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (frame payload decode is stubbed; offsets are real)."""
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.slice(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                ),
                1,
                max_frames,
            )
        ).alias("frame_offset_ms"),
    )
    return frames
