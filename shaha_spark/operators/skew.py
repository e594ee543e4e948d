"""Skew-resistant aggregation: salted two-phase groupBy.

When a groupBy key is heavily skewed (one key holding a large fraction
of rows), the single reducer owning that key becomes the straggler. The
classic fix: scatter each key across N salt buckets, pre-aggregate
per (key, salt) — so the hot key's work spreads over N reducers — then
combine the partials in a second (tiny) aggregation.

The salt only affects WHERE partial work happens, never the result, so
the operator is oracle-exact against a plain GROUP BY. Spark's
map-side partial aggregation already blunts count/sum skew; salting
matters for high-cardinality aggregation state (collect_*, distinct)
and extreme key skew — and AQE skew-join splitting handles the join
flavor of the same problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (phase1 aggregate over raw rows,
    phase2 combiner over the phase-1 partials, which arrive in a column
    of the same name). Example: a global count is
    ``{"n": (F.count(F.lit(1)), F.sum("n"))}``.

    The salt is a seeded uniform int — deterministic per task attempt,
    and irrelevant to the output by construction.
    """
    salt = (F.rand(seed) * n_salts).cast("int").alias("__salt")
    phase1 = df.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[comb.alias(name) for name, (_, comb) in aggs.items()]
    )


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe count + exact decimal sum per key group."""
    dec = F.col(value_col).cast("decimal(18,2)")
    out = salted_agg(
        df,
        keys,
        {
            "n_rows": (F.count(F.lit(1)), F.sum("n_rows")),
            "__sum_dec": (F.sum(dec), F.sum("__sum_dec")),
        },
        n_salts=n_salts,
    )
    return out.select(
        *keys,
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("__sum_dec").cast("double").alias("sum_value"),
    )
