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

from shaha_spark.operators.profile import split_cast_double


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
        split_cast_double(F.col("__sum_dec"), 2).alias("sum_value"),
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-proof equi-join of a huge skewed fact table against a
    small dimension: every fact row takes a seeded random salt, the
    dimension replicates across all ``n_salts`` salt values, and the
    join key becomes (key, salt) — so a hot key's rows spread over
    ``n_salts`` tasks instead of one straggler.

    The replicated dimension stays broadcast (size × n_salts must
    still fit the broadcast threshold); result rows are exactly those
    of the plain join — the salt never reaches the output, so the
    operator is oracle-exact against ``fact JOIN dim``. This is the
    manual form of what AQE skew-join splitting does at shuffle time;
    it also works where AQE can't see the skew (e.g. downstream of a
    cached stage).
    """
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    joined = salted_fact.join(
        F.broadcast(salted_dim),
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == salted_dim["__salt"]),
    )
    return joined.drop("__salt")
