"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
metadata struct; heavy per-item work (decode, resize, feature
extraction, frame sampling) runs in Arrow-batched ``mapInPandas`` so
each task processes columnar batches, not Python rows.

The actual codec step is STUBBED (this container ships no image/audio
libraries): ``real_decode=True`` raises NotImplementedError at the
exact point a Pillow/ffmpeg call would go, while the default
deterministic fake derives metadata from the payload bytes so the
Spark-side plumbing — schema, batch iteration, fan-out shape,
partitioning — is fully real and testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from shaha_spark.operators.constants import FAKE_FORMATS, FAKE_IMG_BASE, FAKE_IMG_MOD

#: Canonical multimodal record: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("media_type", StringType(), False),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def media_from_documents(df: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload — the
    test stand-in for a real (id, image_bytes) table."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for an image decode. The real codec call
    goes exactly here."""
    n = len(payload)
    fmt = FAKE_FORMATS[n % len(FAKE_FORMATS)]
    width = FAKE_IMG_BASE + n % FAKE_IMG_MOD
    height = FAKE_IMG_BASE + (n * 31) % FAKE_IMG_MOD
    return n, fmt, width, height


def decode_metadata(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Per-item decode → typed metadata, via Arrow-batched mapInPandas.

    Batch shape: each pandas DataFrame holds up to
    spark.sql.execution.arrow.maxRecordsPerBatch rows; work is columnar
    within a batch and parallel across partitions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires Pillow/libvips — not in this container"
                )
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [d[0] for d in decoded],
                    "format": [d[1] for d in decoded],
                    "width": [d[2] for d in decoded],
                    "height": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_size: int = 32, max_frames: int = 4,
    real_decode: bool = False,
) -> DataFrame:
    """Frame sampling fan-out: each payload yields up to ``max_frames``
    fixed-stride byte slices (stand-ins for video frames). Demonstrates
    the 1→N batch fan-out shape of mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError("real frame extraction requires ffmpeg")
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                n_frames = min(max_frames, max(1, len(payload) // frame_size))
                stride = max(1, (len(payload) - frame_size) // max(n_frames - 1, 1)) if len(payload) > frame_size else 1
                for i in range(n_frames):
                    start = min(i * stride, max(len(payload) - frame_size, 0))
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[start : start + frame_size])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Byte-histogram feature vector (L1-normalized), numpy-vectorized
    per batch — the real embedding model call replaces the histogram."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                total = hist.sum()
                if total > 0:
                    hist /= total
                feats.append(hist.astype("float32").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(), "feature": feats})

    return media.mapInPandas(run, FEATURE_SCHEMA)
