"""Streaming windowed aggregation with late-data handling.

Generic event-time operators applicable to any streaming DataFrame with
a timestamp column — the building blocks a production ingest pipeline
layers on the events stream (watermark bounds state; tumbling windows
aggregate; append mode emits only finalized windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per key with a watermark.

    Works identically on batch and streaming DataFrames (the batch run
    is how tests pin the semantics); on a stream, the watermark lets
    Spark drop window state once event time passes window_end +
    watermark, keeping state bounded on an unbounded input.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping (hopping) windows: each event lands in
    window/slide buckets, so a 1h window sliding every 15min gives a
    smoothed rate at 4x the row cost — the standard trade-off for
    near-real-time dashboards. Same bounded-state guarantees as the
    tumbling variant."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration, slide_duration).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows (native ``session_window``): a session
    extends while events arrive within ``gap`` of the previous one, so
    window extents are data-driven rather than aligned. This is the
    streaming twin of the batch sessionize query — on a stream, Spark
    merges adjacent session state as late events bridge gaps, and the
    watermark finalizes (and frees) sessions once no bridging event can
    arrive."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
