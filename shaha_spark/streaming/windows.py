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
