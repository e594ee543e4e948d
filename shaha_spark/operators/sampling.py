"""Deterministic sampling and splits for training-data pipelines.

``df.sample``/``sampleBy`` draw from a partition-seeded RNG: the
selected rows change with partitioning, engine, and Spark version —
unacceptable for reproducible train/eval corpora, and impossible to
verify against an external oracle. These operators decide membership
from a cross-engine-stable content hash instead (md5-derived h28, the
same primitive as the dedup family): a row is in the sample iff
``h28(key ∥ salt) mod 10000 < fraction·10000``. Properties:

  * reproducible everywhere — any engine that can md5 agrees row-by-row;
  * stable under repartitioning, appends, and re-runs;
  * nested fractions: a 5% sample is a subset of a 10% sample with the
    same salt (membership is a threshold on one hash value);
  * disjoint splits by bucketing the same hash (train/eval/test).

All pure JVM expressions; the hash is codegen'd per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shaha_spark.functions.text import h28

#: membership granularity: fractions resolve to 1/10000
_BUCKETS = 10_000


def _bucket(key: Column, salt: str) -> Column:
    return h28(F.concat(key.cast("string"), F.lit(salt))) % _BUCKETS


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``key_col``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(_bucket(F.col(key_col), salt) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample a dominant
    source while keeping all of a rare one). Strata absent from
    ``fractions`` use ``default_fraction``."""
    threshold = F.lit(int(default_fraction * _BUCKETS))
    for value, fraction in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(fraction * _BUCKETS))
        ).otherwise(threshold)
    return df.where(_bucket(F.col(key_col), salt) < threshold)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive split assignment (train/eval/test …).

    Splits are consecutive bucket ranges of the same hash, in sorted
    split-name order, so every row lands in exactly one split and the
    assignment survives appends and re-runs. Weights must sum to 1.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    lo = 0
    names = sorted(weights)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 else lo + int(weights[name] * _BUCKETS)
        cond = bucket < hi if expr is None else (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn(split_col, expr)


def h28_sql(expr: str) -> str:
    """DuckDB twin of the membership hash (see functions/text.h28)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 7)) AS BIGINT)"


def bucket_sql(key_col: str, salt: str = "") -> str:
    """DuckDB membership-bucket expression for ``key_col``."""
    keyed = f"concat(CAST({key_col} AS VARCHAR), '{salt}')"
    return f"{h28_sql(keyed)} % {_BUCKETS}"


def hash_sample_sql(
    table: str, fraction: float, key_col: str, salt: str = ""
) -> str:
    return (
        f"SELECT * FROM {table} "
        f"WHERE {bucket_sql(key_col, salt)} < {int(fraction * _BUCKETS)}"
    )


def weighted_hash_sample(
    df: DataFrame,
    weight_col: str,
    max_weight: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling: row kept with probability
    ``weight / max_weight`` — importance sampling for training-mix
    construction (e.g. length-proportional document selection), with
    the same reproducibility guarantees as :func:`hash_sample`.

    The inclusion test is ``bucket * max_weight < weight * BUCKETS``:
    two single IEEE multiplications and a comparison, no division — the
    identical expression replays bit-for-bit in any engine. Weights
    above ``max_weight`` are simply always kept.
    """
    if max_weight <= 0:
        raise ValueError(f"max_weight must be positive, got {max_weight}")
    bucket = _bucket(F.col(key_col), salt).cast("double")
    keep = bucket * F.lit(float(max_weight)) < (
        F.col(weight_col).cast("double") * F.lit(float(_BUCKETS))
    )
    return df.where(keep)


def balanced_sample(
    df: DataFrame,
    label_col: str,
    per_label: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Class-balanced downsample: at most ``per_label`` rows per label,
    chosen by deterministic hash rank (NOT arbitrary head-of-partition
    rows — the selection is a stable pseudo-random draw, reproducible
    across runs, partitionings, and engines).

    One shuffle on the label key; the per-label sort inside the rank
    window is bounded by the label's row count — for heavily skewed
    labels combine with :func:`stratified_hash_sample` to pre-thin the
    giants before the exact top-k rank.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(label_col).orderBy(
        _bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_label)
        .drop("__rk")
    )


def balanced_sample_sql(
    table: str, label_col: str, per_label: int, key_col: str, salt: str = ""
) -> str:
    """DuckDB oracle twin of :func:`balanced_sample`."""
    keyed = f"concat(CAST({key_col} AS VARCHAR), '{salt}')"
    return f"""WITH ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {label_col}
    ORDER BY {h28_sql(keyed)} % {_BUCKETS}, {key_col}
  ) AS rk
  FROM {table}
)
SELECT * EXCLUDE (rk) FROM ranked WHERE rk <= {per_label}"""
