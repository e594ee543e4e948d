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


def table_profile(
    df: DataFrame, columns: list[str], precision: str = "decimal(18,2)"
) -> DataFrame:
    """One profile row per column, computed in a SINGLE aggregation pass.

    All columns' count/null/min/max/sum/sumsq aggregates run in one
    ``agg`` over one scan (a per-column loop would rescan the table per
    column — the difference between one pass and C passes at 100 TB);
    the per-column rows then unpivot from the single aggregate row via
    an array-of-structs explode. Same deterministic decimal arithmetic
    as :func:`numeric_profile`.
    """
    aggs = []
    for c in columns:
        dec = F.col(c).cast(precision)
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
            F.sum(dec).cast("double").alias(f"__s_{c}"),
            F.sum(dec * dec).cast("double").alias(f"__sq_{c}"),
        ]
    one = df.agg(*aggs)
    structs = []
    for c in columns:
        n = F.col(f"__n_{c}")
        s = F.col(f"__s_{c}")
        sq = F.col(f"__sq_{c}")
        mean = s / n
        var = F.when(n > 1, (sq - s * s / n) / (n - F.lit(1))).otherwise(F.lit(0.0))
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                n.alias("n"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
                mean.alias("mean_value"),
                F.sqrt(var).alias("stddev_value"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def table_profile_sql(
    table: str, columns: list[str], precision: str = "DECIMAL(18,2)"
) -> str:
    """DuckDB oracle twin of :func:`table_profile`: the same per-column
    formulas, one SELECT per column, UNION ALL."""
    selects = []
    for c in columns:
        selects.append(f"""SELECT
  '{c}' AS column_name,
  count({c}) AS n,
  count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null,
  CAST(min({c}) AS DOUBLE) AS min_value,
  CAST(max({c}) AS DOUBLE) AS max_value,
  CAST(SUM(CAST({c} AS {precision})) AS DOUBLE) / count({c}) AS mean_value,
  sqrt(CASE WHEN count({c}) > 1 THEN
    (CAST(SUM(CAST({c} AS {precision}) * CAST({c} AS {precision})) AS DOUBLE)
     - CAST(SUM(CAST({c} AS {precision})) AS DOUBLE) * CAST(SUM(CAST({c} AS {precision})) AS DOUBLE) / count({c}))
    / (count({c}) - 1) ELSE 0.0 END) AS stddev_value
FROM {table}""")
    return "\nUNION ALL\n".join(selects)


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
