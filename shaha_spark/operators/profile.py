"""Dataset profiling: per-column statistics for pipeline QA.

Count / nulls / min / max / mean / sample-stddev for numeric columns,
computed so the results are bit-reproducible against an external
oracle: sums and sums-of-squares accumulate in DECIMAL (exact,
order-independent), and the final mean/stddev are a fixed sequence of
double operations on those exact values. Built-in ``stddev`` would NOT
reproduce across engines (per-partition float accumulation differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile(
    df: DataFrame, column: str, precision: str = "decimal(18,2)"
) -> DataFrame:
    """One-row profile of a numeric column.

    stddev = sqrt((sumsq - sum²/n) / (n-1)) with sumsq/sum exact
    decimals cast to double — deterministic because every floating
    operation is a single IEEE op on identical inputs.
    """
    dec = F.col(column).cast(precision)
    n = F.count(F.col(column))
    s = F.sum(dec).cast("double")
    sq = F.sum(dec * dec).cast("double")
    mean = s / n
    var = F.when(n > 1, (sq - s * s / n) / (n - F.lit(1))).otherwise(F.lit(0.0))
    return df.agg(
        n.alias("n"),
        F.count(F.when(F.col(column).isNull(), 1)).alias("n_null"),
        F.min(F.col(column)).cast("double").alias("min_value"),
        F.max(F.col(column)).cast("double").alias("max_value"),
        mean.alias("mean_value"),
        F.sqrt(var).alias("stddev_value"),
    )


def profile_sql(table: str, column: str, precision: str = "DECIMAL(18,2)") -> str:
    """DuckDB oracle twin of :func:`numeric_profile` (same formula, same
    op order — do NOT substitute the engine's stddev())."""
    return f"""SELECT
  count({column}) AS n,
  count(CASE WHEN {column} IS NULL THEN 1 END) AS n_null,
  CAST(min({column}) AS DOUBLE) AS min_value,
  CAST(max({column}) AS DOUBLE) AS max_value,
  CAST(SUM(CAST({column} AS {precision})) AS DOUBLE) / count({column}) AS mean_value,
  sqrt(CASE WHEN count({column}) > 1 THEN
    (CAST(SUM(CAST({column} AS {precision}) * CAST({column} AS {precision})) AS DOUBLE)
     - CAST(SUM(CAST({column} AS {precision})) AS DOUBLE) * CAST(SUM(CAST({column} AS {precision})) AS DOUBLE) / count({column}))
    / (count({column}) - 1) ELSE 0.0 END) AS stddev_value
FROM {table}"""
