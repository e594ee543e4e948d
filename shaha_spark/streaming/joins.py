"""Stream-stream joins with bounded state.

An unconstrained stream-stream join needs unbounded state (any future
row might match any past one). The standard construction bounds it
three ways at once: watermarks on BOTH inputs, an event-time range in
the join condition (so each row only ever matches a bounded time
window), and the equi-key. Spark then knows exactly when a buffered row
can never match again and evicts it — state stays proportional to
rate × window, not to stream length.

This is the streaming twin of the batch interval/as-of joins in
``operators/joins.py``: same attribution semantics, expressed as a
join because Structured Streaming manages the buffering that the batch
as-of union-window trick performs explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_window_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join ``left`` rows to ``right`` rows with the same key
    whose timestamp falls in ``[left_ts - max_delay, left_ts]`` — e.g.
    purchases to the signups that preceded them within the attribution
    window.

    Both sides are watermarked; the range condition is what lets Spark
    evict right-side state once the left watermark passes
    ``right_ts + max_delay``. Column names are prefixed ``l_``/``r_``
    in the output to keep the join self-describing.
    """
    l = left.withWatermark(left_ts, watermark).select(
        F.col(key_col).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key_col, left_ts)],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(key_col).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key_col, right_ts)],
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner")
