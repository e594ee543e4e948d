"""Small-file compaction for long-lived hash databases.

Every streaming micro-batch or incremental append adds files; at 100 TB
a database accumulating thousands of small parquet files pays for it on
every query (task-per-file scheduling, footer reads, lost row-group
locality). Compaction rewrites the dataset into size-targeted files
while PRESERVING the global hash sort (the property point lookups and
prefix scans rely on), then swaps it into place with the same
checked-rename protocol as append.

The rewrite is one range-repartition + per-partition sort + write —
identical machinery to the original build, so a compacted database is
indistinguishable from a freshly built one (same layout, same blooms,
same sidecar schema). The planner is pure metadata: it reads file
listings, never data, and skips when the layout is already within
target, so a no-op compaction costs one directory listing.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import SparkSession

from shaha_spark import io_util
from shaha_spark.pipeline.build import (
    read_hashdb,
    read_sidecar,
    sort_for_write,
    write_hashdb,
    write_sidecar,
)

#: default target size per output file (pre-compression bytes on disk)
DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[str, Any]:
    """Metadata-only compaction plan: current layout vs target.

    ``needed`` is True when the file count exceeds what the total size
    justifies at ``target_file_bytes`` — i.e. the dataset is fragmented,
    not merely large.
    """
    files = io_util.list_files(spark, path)
    total = sum(sz for _, sz in files)
    target_files = max(1, math.ceil(total / target_file_bytes))
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": target_files,
        "needed": len(files) > target_files,
    }


def compact_hashdb(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    force: bool = False,
) -> dict[str, Any]:
    """Rewrite ``path`` into ``target_files`` hash-sorted files.

    No-op (returns the plan with ``compacted=False``) unless the plan
    says fragmentation exists or ``force`` is set. The swap follows the
    build/append protocol: write to a temp dir, checked-rename the live
    dataset aside, checked-rename the compacted one into place, drop
    the backup only after both renames succeeded. The sidecar's logical
    metadata (algorithms, sources, total_records) is carried over
    unchanged; its physical stats are recomputed.
    """
    plan = plan_compaction(spark, path, target_file_bytes)
    if not plan["needed"] and not force:
        return {**plan, "compacted": False}

    meta = read_sidecar(spark, path)
    df = read_hashdb(spark, path)
    # an algorithm-partitioned layout must stay partitioned — silently
    # flattening it would drop directory pruning for algorithm filters
    partitioned = any(
        "/algorithm=" in p for p, _ in io_util.list_files(spark, path)
    )
    tmp = path.rstrip("/") + ".__compact__"
    io_util.delete(spark, tmp)
    write_hashdb(
        sort_for_write(df, num_files=plan["target_files"]),
        tmp,
        mode="overwrite",
        expected_records=(meta or {}).get("total_records"),
        partition_by_algorithm=partitioned,
    )

    backup = path.rstrip("/") + ".__old__"
    io_util.delete(spark, backup)
    if not io_util.rename(spark, path, backup):
        io_util.delete(spark, tmp)
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not io_util.rename(spark, tmp, path):
        restored = io_util.rename(spark, backup, path)
        raise IOError(
            f"compaction swap failed: could not move {tmp} into place"
            + ("" if restored else f"; MANUAL RESTORE NEEDED from {backup}")
        )
    io_util.delete(spark, backup)

    if meta is not None:
        write_sidecar(
            spark,
            path,
            total_records=meta["total_records"],
            algorithms=meta.get("algorithms", []),
            sources=meta.get("sources", []),
            source_hashes=meta.get("source_hashes", []),
        )
    after = plan_compaction(spark, path, target_file_bytes)
    return {
        **plan,
        "compacted": True,
        "files_after": after["n_files"],
    }
