"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
metadata struct; heavy per-item work (decode, resize, feature
extraction, frame sampling) runs in Arrow-batched ``mapInPandas`` so
each task processes columnar batches, not Python rows.

The codec layer is tiered by what the container allows: metadata
decode (``real_decode=True``) parses real PNG / GIF / JPEG container
headers with the stdlib (no Pillow needed — signature + IHDR / logical
screen descriptor / SOF scan); any other format raises
NotImplementedError at the exact point a full codec call would go.
Pixel-level work (frame extraction) stays stubbed behind the same
flag — that genuinely needs ffmpeg/Pillow — while the default
deterministic fake keeps the Spark-side plumbing (schema, batch
iteration, fan-out shape, partitioning) fully real and testable
end-to-end.
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

VIDEO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), False),
        StructField("timescale", IntegerType(), False),
        StructField("duration_ms", LongType(), False),
    ]
)

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("n_frames", LongType(), False),
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


def real_decode_header(payload: bytes) -> tuple[int, str, int, int]:
    """Stdlib container-header decode for PNG / GIF / JPEG.

    PNG: 8-byte signature, then the IHDR chunk carries width/height as
    big-endian u32 at offsets 16/20. GIF: 'GIF87a'/'GIF89a', logical
    screen width/height as little-endian u16 at offsets 6/8. JPEG: walk
    the marker stream to the first SOF marker (0xFFC0-0xFFCF excluding
    DHT/DAC C4/C8/CC) and read height/width from its payload. Anything
    else is where a full codec library (Pillow/libvips) would plug in.
    """
    import struct

    payload = bytes(payload)
    n = len(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and n >= 24 and payload[12:16] == b"IHDR":
        width, height = struct.unpack(">II", payload[16:24])
        return n, "png", width, height
    if payload[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
        width, height = struct.unpack("<HH", payload[6:10])
        return n, "gif", width, height
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 2 <= n:
            if payload[i] != 0xFF:
                break
            # the spec allows any run of 0xFF FILL bytes before the
            # marker byte — skip them or the next 0xFF would be
            # misread as a length-bearing marker and the walk would
            # jump past the real SOF
            while i + 2 <= n and payload[i + 1] == 0xFF:
                i += 1
            if i + 2 > n:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
                i += 2
                continue
            if marker == 0xD9:  # EOI: stream over, no SOF seen
                break
            if i + 4 > n:
                break
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    break  # truncated inside the SOF payload
                height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
                return n, "jpeg", width, height
            i += 2 + seg_len
        raise NotImplementedError("JPEG without a SOF marker — needs a full codec")
    raise NotImplementedError(
        "no stdlib header codec for this payload — a Pillow/libvips call goes here"
    )


def real_decode_audio(payload: bytes) -> tuple[int, str, int, int, int]:
    """Stdlib container-header decode for WAV (RIFF): walk the chunk
    list to 'fmt ' for channels/sample-rate and 'data' for the frame
    count. Anything else is where ffmpeg/soundfile would plug in.
    Returns (n_bytes, format, sample_rate, channels, n_frames)."""
    import struct

    payload = bytes(payload)
    n = len(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        channels = sample_rate = bits = None
        n_frames = 0
        i = 12
        while i + 8 <= n:
            ctype = payload[i : i + 4]
            (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
            # a standard fmt chunk body is >= 16 bytes; the bits-per-
            # sample field sits at i+22, so the guard must cover i+24
            # or a payload truncated inside fmt raises struct.error
            # instead of the contract's NotImplementedError
            if ctype == b"fmt " and clen >= 16 and i + 24 <= n:
                channels, sample_rate = struct.unpack("<HI", payload[i + 10 : i + 16])
                (bits,) = struct.unpack("<H", payload[i + 22 : i + 24])
            elif ctype == b"data" and channels and bits and bits >= 8:
                n_frames = clen // (channels * (bits // 8))
            i += 8 + clen + (clen % 2)  # chunks are word-aligned
        if channels and sample_rate:
            return n, "wav", sample_rate, channels, n_frames
        raise NotImplementedError("RIFF without a fmt chunk — needs a full codec")
    raise NotImplementedError(
        "no stdlib audio codec for this payload — an ffmpeg/soundfile call goes here"
    )


def real_decode_video(payload: bytes) -> tuple[int, str, int, int]:
    """Stdlib container-header decode for MP4/ISO-BMFF: walk the
    top-level box list to 'moov', then its children to 'mvhd', and read
    timescale + duration (version 0: u32s at +12; version 1: u64
    duration at +20 after u64 times). Anything else is where a full
    demuxer (ffmpeg) would plug in.
    Returns (n_bytes, format, timescale, duration_ms)."""
    import struct

    payload = bytes(payload)
    n = len(payload)

    def walk(lo: int, hi: int, want: bytes) -> tuple[int, int] | None:
        # clamp: a parent box's declared size may point past the
        # actual payload end, and every read below assumes hi <= n
        hi = min(hi, n)
        i = lo
        while i + 8 <= hi:
            (size,) = struct.unpack(">I", payload[i : i + 4])
            btype = payload[i + 4 : i + 8]
            body = i + 8
            if size == 1:  # 64-bit largesize
                if i + 16 > hi:
                    return None  # truncated inside the largesize field
                (size,) = struct.unpack(">Q", payload[i + 8 : i + 16])
                body = i + 16
                if size < 16:
                    return None  # a largesize box is at least 16 bytes
            elif size < 8:
                return None
            if btype == want:
                return body, i + size
            i += size
        return None

    if n >= 12 and payload[4:8] == b"ftyp":
        moov = walk(0, n, b"moov")
        if moov:
            mvhd = walk(*moov, b"mvhd")
            if mvhd and mvhd[0] < n:
                body = mvhd[0]
                version = payload[body]
                # bounds-check the fixed-layout reads: a truncated
                # mvhd must fall through to NotImplementedError, not
                # crash the task with struct.error
                if version == 1 and body + 32 <= n:
                    timescale, duration = struct.unpack(
                        ">IQ", payload[body + 20 : body + 32]
                    )
                elif version == 0 and body + 20 <= n:
                    timescale, duration = struct.unpack(
                        ">II", payload[body + 12 : body + 20]
                    )
                else:
                    raise NotImplementedError(
                        "truncated mvhd box — needs a full demuxer"
                    )
                ms = duration * 1000 // timescale if timescale else 0
                return n, "mp4", timescale, ms
        raise NotImplementedError("MP4 without moov/mvhd — needs a full demuxer")
    raise NotImplementedError(
        "no stdlib video codec for this payload — an ffmpeg call goes here"
    )


def decode_video_metadata(media: DataFrame) -> DataFrame:
    """Video tier of the codec boundary: MP4 mvhd headers parsed for
    real in Arrow-batched mapInPandas; other formats raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [real_decode_video(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [d[0] for d in decoded],
                    "format": [d[1] for d in decoded],
                    "timescale": [d[2] for d in decoded],
                    "duration_ms": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(run, VIDEO_SCHEMA)


def decode_audio_metadata(media: DataFrame) -> DataFrame:
    """Audio tier of the codec boundary: WAV headers parsed for real in
    Arrow-batched mapInPandas; other formats raise at the codec line."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [real_decode_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [d[0] for d in decoded],
                    "format": [d[1] for d in decoded],
                    "sample_rate": [d[2] for d in decoded],
                    "channels": [d[3] for d in decoded],
                    "n_frames": [d[4] for d in decoded],
                }
            )

    return media.mapInPandas(run, AUDIO_SCHEMA)


def decode_metadata(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Per-item decode → typed metadata, via Arrow-batched mapInPandas.

    Batch shape: each pandas DataFrame holds up to
    spark.sql.execution.arrow.maxRecordsPerBatch rows; work is columnar
    within a batch and parallel across partitions. ``real_decode=True``
    parses real PNG/GIF/JPEG headers (see real_decode_header).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = real_decode_header if real_decode else _fake_decode
        for pdf in batches:
            decoded = [codec(p) for p in pdf["payload"]]
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


def dedup_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact binary dedup of media payloads: group by the payload's
    sha256 digest, keep the lowest id per class.

    The digest — 32 bytes — is the group key, never the payload: at
    100 TB the shuffle moves (digest, id) pairs while the binary
    columns stay in place, the same dedup-before-heavy-work shape as
    the wordlist pipeline (pipeline/build.py). Output is (keep_id,
    n_members, payload_bytes), digest-free, so an oracle engine
    without BLOB sha256 can reproduce it by grouping on payload
    equality directly — identical equivalence classes.
    """
    return (
        media.select(
            F.col(id_col),
            F.sha2(F.col(payload_col), 256).alias("__digest"),
            F.octet_length(F.col(payload_col)).alias("__bytes"),
        )
        .groupBy("__digest")
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.first("__bytes").alias("payload_bytes"),
        )
        .select(
            "keep_id",
            "n_members",
            F.col("payload_bytes").cast("bigint").alias("payload_bytes"),
        )
    )
