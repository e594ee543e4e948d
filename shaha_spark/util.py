"""Small plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
