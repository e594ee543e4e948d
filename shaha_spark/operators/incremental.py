"""Incremental aggregate maintenance: keep a (key, hour) rollup table
up to date by folding in new event batches WITHOUT rescanning history —
the batch counterpart of a streaming windowed aggregation, and the
standard shape for maintaining a materialized rollup over an
append-only 100 TB event store.

Exactness: the partial state per bucket is ``(count, DECIMAL(38,2)
sum)`` — inputs quantize at scale 2, and the state column carries the
widest precision Spark supports so repeated merges never narrow it.
Decimal addition is associative and commutative, so any split
of the input into batches — and any merge order — reproduces the
full-recompute result bit-for-bit. That identity is what the driver
oracle checks: a two-batch incremental build must hash-match DuckDB's
single-pass aggregation over all events.

Scale: each increment aggregates ONLY the new batch (one hash-agg with
map-side partials), and the merge is a full-outer equi-join on the
bucket key — proportional to the touched buckets, not to history.
Late-arriving data needs no special case: its bucket either merges
into an existing row or creates one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shaha_spark.operators.profile import split_cast_double, split_cast_double_sql


def rollup_increment(
    events: DataFrame,
    key_col: str = "event_type",
    tus_col: str = "tus",
    value_col: str = "value",
) -> DataFrame:
    """Partial-state rollup of one batch: ``(key, hour, n, sv)`` with
    the decimal sum kept as state (not yet cast for display)."""
    hour = F.date_trunc("hour", F.timestamp_micros(F.col(tus_col)))
    return events.groupBy(F.col(key_col), hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        # inputs quantize at scale 2; the STATE column carries the
        # widest decimal Spark supports so repeated merges never narrow
        # it back down (a cast to decimal(18,2) would silently NULL any
        # accumulated total past 18 digits under non-ANSI semantics)
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("sv"),
    )


def merge_rollup(existing: DataFrame, increment: DataFrame) -> DataFrame:
    """Fold an increment into an existing rollup: full-outer on the
    bucket key, counts and decimal sums add; buckets absent from one
    side pass through unchanged."""
    key_cols = [c for c in existing.columns if c not in ("n", "sv")]
    # NULL-SAFE key equality: groupBy put all NULL-key rows in ONE
    # bucket on each side, but a null-unsafe full-outer join would
    # never match them, accumulating duplicate (key, NULL) rows across
    # increments and breaking the oracle identity. Key columns are
    # RENAMED per side first — both inputs often share lineage (state
    # merged with an increment of the same source), where a[k]/b[k]
    # would resolve to one attribute and degenerate to always-true.
    a = existing.select(
        *[F.col(k).alias(f"__ka{i}") for i, k in enumerate(key_cols)],
        F.col("n").alias("__na"),
        F.col("sv").alias("__sa"),
    )
    b = increment.select(
        *[F.col(k).alias(f"__kb{i}") for i, k in enumerate(key_cols)],
        F.col("n").alias("__nb"),
        F.col("sv").alias("__sb"),
    )
    zero = F.lit(0).cast("decimal(38,2)")
    cond = None
    for i in range(len(key_cols)):
        c = F.col(f"__ka{i}").eqNullSafe(F.col(f"__kb{i}"))
        cond = c if cond is None else cond & c
    joined = a.join(b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__ka{i}"), F.col(f"__kb{i}")).alias(k)
            for i, k in enumerate(key_cols)
        ],
        "__na", "__sa", "__nb", "__sb",
    )
    return joined.select(
        *key_cols,
        (F.coalesce(F.col("__na"), F.lit(0)) + F.coalesce(F.col("__nb"), F.lit(0)))
        .cast("bigint")
        .alias("n"),
        # keep the partial state at the widened precision end to end —
        # narrowing per merge would corrupt the maintained rollup once
        # totals exceed the narrow precision
        (F.coalesce(F.col("__sa"), zero) + F.coalesce(F.col("__sb"), zero))
        .cast("decimal(38,2)")
        .alias("sv"),
    )


def finalize_rollup(rollup: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Display form: formatted hour, bigint count, double sum — the
    same rendering convention as the one-shot hourly query."""
    return rollup.select(
        F.col(key_col),
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast("bigint").alias("n_events"),
        split_cast_double(F.col("sv"), 2).alias("sum_value"),
    )


def incremental_rollup_sql(table: str = "events") -> str:
    """DuckDB oracle: the FULL single-pass aggregation the incremental
    path must reproduce exactly, regardless of how the input was
    batched."""
    return f"""SELECT event_type,
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
  CAST(count(*) AS BIGINT) AS n_events,
  {split_cast_double_sql("SUM(CAST(value AS DECIMAL(18,2)))", 2)} AS sum_value
FROM {table} GROUP BY 1, 2"""
