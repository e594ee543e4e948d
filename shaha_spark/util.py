"""Small plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-local TIMESTAMP
    regardless of how the parquet writer encoded it.

    Three encodings appear in the wild (and across regenerations of the
    test fixtures): TIMESTAMP(NANOS) read as raw int64 under
    ``spark.sql.legacy.parquet.nanosAsLong`` (Spark's reader has no
    nanosecond timestamp type), plain micros TIMESTAMP_NTZ, and an
    already-local TIMESTAMP. The nanos path truncates ns → us, the same
    coercion DuckDB applies, so downstream epoch-microsecond math
    (`unix_micros`) agrees with ``epoch_us(ts)`` on the oracle side;
    the NTZ path reinterprets the wall-clock in the session timezone
    (callers pin UTC), which is exactly DuckDB's naive-timestamp view.
    """
    from pyspark.sql import functions as F

    kind = dict(df.dtypes)[ts_col]
    if kind == "bigint":
        # integer DIV, not `/`: float division of int64 nanos loses
        # precision past 2^53 and would shift timestamps by whole micros
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` DIV 1000"))
        )
    if kind == "timestamp_ntz":
        # The NTZ -> TIMESTAMP cast reinterprets the wall clock in the
        # session timezone; any zone other than UTC would silently shift
        # every derived epoch-microsecond value, so pin it here rather
        # than trusting each caller to.
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread CPU-heavy per-row work across the cluster when the input
    arrives under-partitioned (e.g. one small parquet/text file → one
    task doing all the hashing/shingling on one core). No-op when the
    scan already has ≥ defaultParallelism partitions — i.e. at real
    data volumes, where repartitioning the raw input would be a
    catastrophic extra shuffle."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
