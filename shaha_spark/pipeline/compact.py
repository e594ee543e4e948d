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

import json
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
    from . import snapshot

    files = snapshot.live_files(spark, path)
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
    from . import snapshot

    old_live = snapshot.live_files(spark, path)
    partitioned = any("/algorithm=" in p for p, _ in old_live)
    tmp = path.rstrip("/") + ".__compact__"
    io_util.delete(spark, tmp)
    write_hashdb(
        sort_for_write(df, num_files=plan["target_files"]),
        tmp,
        mode="overwrite",
        partition_by_algorithm=partitioned,
    )

    snapshot.swap_live_tree(spark, path, tmp, old_live, op="compaction")

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


# ------------------------------------------------------------ slices

def _local(path: str) -> str | None:
    """Local-filesystem form of a Hadoop path, or None if remote."""
    if path.startswith("file:"):
        return path[len("file:"):]
    if "://" not in path and not path.startswith("viewfs:"):
        return path
    return None


def plan_slice_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_ratio: float = 0.5,
) -> dict[str, Any]:
    """Plan per-slice compaction: contiguous runs of undersized files.

    The global hash sort makes every file a disjoint [min, max] hash
    range, so any contiguous-in-range subset can be rewritten
    independently without touching (or re-sorting) the rest — at 100 TB
    this is the difference between rewriting gigabytes and rewriting
    the dataset. Planning is driver-side footer metadata only: each
    candidate file's min `hash` statistic orders the run; no data is
    read. Partitioned layouts are sliced per partition directory
    (ranges from different ``algorithm=`` partitions interleave and
    must never merge).

    Requires a local filesystem (footers are read with pyarrow); on an
    object store, plan whole-dataset compaction (:func:`plan_compaction`)
    or per-partition-dir compaction instead.
    """
    import os
    from collections import defaultdict

    import pyarrow.parquet as pq

    from . import snapshot

    small = int(target_file_bytes * small_ratio)
    by_dir: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for p, sz in snapshot.live_files(spark, path):
        by_dir[os.path.dirname(p)].append((p, sz))

    slices: list[dict[str, Any]] = []
    for d, files in sorted(by_dir.items()):
        keyed = []
        for p, sz in files:
            lp = _local(p)
            if lp is None:
                raise ValueError(
                    f"slice planning needs local parquet footers, got {p}; "
                    "use plan_compaction/compact_hashdb for remote stores"
                )
            md = pq.ParquetFile(lp).metadata
            col_idx = md.schema.to_arrow_schema().names.index("hash")
            lo = md.row_group(0).column(col_idx).statistics.min
            keyed.append((lo, p, sz))
        keyed.sort()
        run: list[tuple[str, int]] = []
        run_bytes = 0

        def flush():
            nonlocal run, run_bytes
            if len(run) >= 2:
                slices.append({"dir": d, "files": run, "bytes": run_bytes})
            run, run_bytes = [], 0

        for _, p, sz in keyed:
            if sz >= small or run_bytes + sz > int(target_file_bytes * 1.5):
                flush()
            if sz < small:
                run.append((p, sz))
                run_bytes += sz
        flush()
    return {
        "n_slices": len(slices),
        "slice_files": sum(len(s["files"]) for s in slices),
        "slice_bytes": sum(s["bytes"] for s in slices),
        "slices": slices,
        "needed": bool(slices),
    }


#: sidecar manifest name per staged slice file: records the swap so a
#: crash between "delete originals" and "rename visible" rolls forward
MANIFEST_SUFFIX = ".manifest.json"


def recover_slices(spark: SparkSession, path: str) -> dict[str, int]:
    """Finish or undo slice swaps interrupted by a crash.

    * staged ``_incoming`` file WITH a manifest: the swap committed —
      roll forward (delete any surviving originals, rename the
      replacement visible, drop the manifest);
    * staged file WITHOUT a manifest: the swap never committed — the
      originals are all still live, so the stage is redundant; drop it.

    Idempotent; called automatically by :func:`compact_slices`.
    """
    import os

    entries = io_util.list_files(spark, path, suffix=None)
    names = {p for p, _ in entries}
    rolled = dropped = 0
    for p in sorted(names):
        base = os.path.basename(p)
        if base.startswith("_incoming-") and p.endswith(MANIFEST_SUFFIX):
            incoming = p[: -len(MANIFEST_SUFFIX)]
            try:
                manifest = json.loads(io_util.read_text(spark, p) or "")
                manifest["final"]
            except (ValueError, KeyError, TypeError):
                # torn manifest (crash mid-write, pre-atomic-write
                # legacy): the commit point was never reached, so the
                # originals are all intact — drop the stage and the
                # torn marker instead of crashing recovery forever
                io_util.delete(spark, p)
                if incoming in names:
                    io_util.delete(spark, incoming)
                    dropped += 1
                continue
            for orig in manifest.get("originals", []):
                io_util.delete(spark, orig)
            if incoming in names:
                if not io_util.rename(spark, incoming, manifest["final"]):
                    raise IOError(
                        f"slice recovery: could not make {incoming} visible"
                    )
            io_util.delete(spark, p)
            rolled += 1
        elif base.startswith("_incoming-") and not p.endswith(MANIFEST_SUFFIX):
            if p + MANIFEST_SUFFIX not in names:
                io_util.delete(spark, p)
                dropped += 1
    return {"rolled_forward": rolled, "dropped_stages": dropped}


def compact_slices(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    max_slices: int | None = None,
) -> dict[str, Any]:
    """Rewrite each fragmented hash-range slice into one sorted file.

    Per-slice swap protocol (no directory swap — the rest of the
    dataset keeps serving): the replacement file lands in the dataset
    directory under an ``_incoming`` name (underscore-prefixed files
    are invisible to parquet readers), a manifest records the swap
    about to happen, the originals are deleted, the replacement is
    renamed visible, the manifest is dropped. Any crash is recoverable
    by :func:`recover_slices` (run automatically at the start of every
    compaction): incoming WITHOUT manifest → originals are intact,
    drop the stage; incoming WITH manifest → the swap was committed,
    roll it FORWARD (finish the deletes, make the replacement
    visible). A transactional table format would collapse the whole
    protocol into one commit — noted in SCALE.md; this is the honest
    ceiling of a directory-layout store.

    ``max_slices`` bounds one maintenance run (schedule by
    fragmentation score at scale); slices are processed worst-first
    (most files first).
    """
    import os
    import uuid

    from . import snapshot

    recovered = recover_slices(spark, path)
    snap_refs = snapshot.referenced_rels(spark, path)
    plan = plan_slice_compaction(spark, path, target_file_bytes)
    todo = sorted(plan["slices"], key=lambda s: -len(s["files"]))
    if max_slices is not None:
        todo = todo[:max_slices]
    if not todo:
        return {**plan, "compacted": 0, "recovered": recovered}

    done = 0
    for s in todo:
        files = [p for p, _ in s["files"]]
        df = spark.read.parquet(*files)
        sort_cols = ["hash"] + (["algorithm"] if "algorithm" in df.columns else [])
        tmp = s["dir"].rstrip("/") + f"/.__slice_{uuid.uuid4().hex[:8]}__"
        # write_hashdb is the one home of the zstd/bloom writer options
        write_hashdb(df.coalesce(1).sortWithinPartitions(*sort_cols), tmp)
        part = next(
            p for p, _ in io_util.list_files(spark, tmp) if p.endswith(".parquet")
        )
        stem = f"slice-{uuid.uuid4().hex[:12]}.zstd.parquet"
        incoming = s["dir"].rstrip("/") + f"/_incoming-{stem}"
        final = s["dir"].rstrip("/") + f"/{stem}"
        if not io_util.rename(spark, part, incoming):
            io_util.delete(spark, tmp)
            raise IOError(f"slice compaction: could not stage {incoming}")
        # commit point: once the manifest exists, recovery rolls this
        # swap FORWARD (deletes finished, replacement made visible)
        io_util.write_text_atomic(
            spark,
            incoming + MANIFEST_SUFFIX,
            json.dumps({"originals": files, "final": final}),
        )
        for p in files:
            snapshot.retire_or_delete(spark, path, p, refs=snap_refs)
        if not io_util.rename(spark, incoming, final):
            raise IOError(
                f"slice compaction: staged file {incoming} could not be "
                f"made visible; its manifest will roll the swap forward "
                "on the next run"
            )
        io_util.delete(spark, incoming + MANIFEST_SUFFIX)
        io_util.delete(spark, tmp)
        done += 1

    meta = read_sidecar(spark, path)
    if meta is not None:
        write_sidecar(
            spark,
            path,
            total_records=meta["total_records"],
            algorithms=meta.get("algorithms", []),
            sources=meta.get("sources", []),
            source_hashes=meta.get("source_hashes", []),
        )
    return {**plan, "compacted": done, "recovered": recovered}
