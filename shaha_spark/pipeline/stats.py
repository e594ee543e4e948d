"""Database stats: sidecar fast path with full-scan fallback.

Mirrors ``shaha info`` (ref /root/reference/src/cli/info.rs:45-59):
O(1) metadata read when the sidecar exists (ref parquet.rs:152-202),
otherwise a scan aggregate (A3, ref parquet.rs:353-394).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from shaha_spark.pipeline.build import read_hashdb, read_sidecar


def scan_stats(spark: SparkSession, path: str) -> dict[str, Any]:
    """Full-scan aggregate (ref parquet.rs:353-394): COUNT(*), distinct
    algorithms, distinct exploded sources. Column pruning means only the
    `algorithm` and `sources` columns are read (F5/P9)."""
    df = read_hashdb(spark, path)
    row = df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.sort_array(F.collect_set("algorithm")).alias("algorithms"),
    ).head()
    sources = [
        r[0]
        for r in df.select(F.explode("sources").alias("s")).distinct().orderBy("s").collect()
    ]
    return {
        "total_records": row.total_records,
        "algorithms": list(row.algorithms),
        "sources": sources,
    }


def info(spark: SparkSession, path: str) -> dict[str, Any]:
    """Sidecar fast path, scan fallback (ref parquet.rs:572-582)."""
    from shaha_spark import io_util

    meta = read_sidecar(spark, path)
    if meta is not None:
        size = meta.get("file_size_bytes")
        if size is None:  # sidecar predates the field — compute live
            size = io_util.tree_size(spark, path)
        return {
            "total_records": meta["total_records"],
            "algorithms": meta["algorithms"],
            "sources": meta["sources"],
            "file_size_bytes": size,
            "from_metadata": True,
        }

    return {
        **scan_stats(spark, path),
        "file_size_bytes": io_util.tree_size(spark, path),
        "from_metadata": False,
    }
