"""Targeted record deletion ("forget") from a hash database — the
GDPR-style erasure path: remove every record for a set of preimages
(or raw digests) while rewriting ONLY the files whose hash range can
contain them.

Why this is cheap here: the build writes the dataset globally sorted
by digest (range partitioning), so each parquet file covers a disjoint
[min, max] hash slice and footer statistics locate the files a digest
could live in without reading any data. A forget of k digests touches
at most k files (usually far fewer), regardless of dataset size — at
100 TB that's the difference between rewriting gigabytes and running a
full-dataset anti-join job.

Pruning is conservative: a file is a candidate if any target digest
falls inside its footer [min, max] (truncated parquet statistics only
widen the range, so candidates are a superset); the rewrite then
filters by EXACT digest equality, so over-selection costs a file scan,
never a wrong delete.

The per-file swap reuses the slice-compaction crash protocol
(`_incoming` staging + manifest commit point; see
:func:`shaha_spark.pipeline.compact.recover_slices`): a crash mid-swap
either leaves the original intact or rolls the replacement forward —
never both, never neither. Files whose every row is forgotten are
simply deleted (idempotent; a crash just re-deletes on re-run).

This is an extension beyond the reference CLI (which has no delete);
a transactional table format would make the swap a metadata commit —
noted in SCALE.md as the production upgrade path.
"""

from __future__ import annotations

import json
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shaha_spark import io_util
from shaha_spark.pipeline.build import read_sidecar, write_sidecar
from shaha_spark.pipeline.compact import MANIFEST_SUFFIX, _local, recover_slices


def _footer_range(local_path: str) -> tuple[bytes | None, bytes | None, int]:
    """(min, max, num_rows) of the ``hash`` column across all row
    groups, from footer metadata only."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(local_path).metadata
    col_idx = md.schema.to_arrow_schema().names.index("hash")
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(col_idx).statistics
        if st is None or st.min is None or st.max is None:
            return None, None, md.num_rows  # no stats: stay a candidate
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi, md.num_rows


def plan_forget(
    spark: SparkSession, path: str, digests: list[bytes]
) -> dict[str, Any]:
    """Driver-side footer-only planning: which files can contain any
    of ``digests``. Requires a local filesystem for footer reads (the
    same constraint as slice compaction)."""
    targets = sorted(set(digests))
    candidates: list[dict[str, Any]] = []
    total_files = 0
    for p, _sz in io_util.list_files(spark, path):
        total_files += 1
        lp = _local(p)
        if lp is None:
            raise ValueError(
                f"forget planning needs local parquet footers, got {p}"
            )
        lo, hi, n_rows = _footer_range(lp)
        if lo is None or any(lo <= d <= hi for d in targets):
            candidates.append({"file": p, "rows": n_rows})
    return {
        "n_digests": len(targets),
        "total_files": total_files,
        "candidate_files": len(candidates),
        "candidates": candidates,
    }


def _empty_forget_report() -> dict[str, Any]:
    """Nothing-to-do report with the SAME key set as a real run, so
    callers reading any documented key never hit a shape difference."""
    return {
        "n_digests": 0,
        "total_files": 0,
        "candidate_files": 0,
        "rows_deleted": 0,
        "live_rows_deleted": 0,
        "files_rewritten": 0,
        "files_dropped": 0,
        "recovered": {"rolled_forward": 0, "dropped_stages": 0},
    }


def forget_digests(
    spark: SparkSession, path: str, digests: list[bytes]
) -> dict[str, Any]:
    """Delete every record whose ``hash`` equals one of ``digests``,
    rewriting only range-matching files. Returns a report; idempotent
    (a second run deletes nothing)."""
    if not digests:
        return _empty_forget_report()
    from . import snapshot

    recovered = recover_slices(spark, path)
    snap_refs = snapshot.referenced_rels(spark, path)
    plan = plan_forget(spark, path, digests)
    targets = [bytes(d) for d in sorted(set(digests))]

    rows_deleted = live_rows_deleted = rewritten = dropped = 0
    for cand in plan["candidates"]:
        p = cand["file"]
        df: DataFrame = spark.read.parquet(p)
        # lazy checkpoint: the survivor set is consumed twice (the count
        # that decides drop-vs-rewrite, then the rewrite itself) — one
        # filtered read of the candidate file instead of two
        remaining = df.where(~F.col("hash").isin(targets)).localCheckpoint(
            eager=False
        )
        n_after = remaining.count()
        n_delete = cand["rows"] - n_after
        if n_delete == 0:
            continue  # range false positive
        rows_deleted += n_delete
        # rows scrubbed from retained history copies under _snapshots/
        # are not live rows: the sidecar's total_records counts the
        # visible database only, so decrementing it by history-copy
        # deletions would make info/stats drift permanently after any
        # compaction+snapshot cycle
        if not snapshot.in_retained(path, p):
            live_rows_deleted += n_delete
        d = p.rsplit("/", 1)[0]
        if n_after == 0:
            # every row was an erasure target: the file leaves history
            # too (read_snapshot reports the hole) — erased data may
            # not survive in retained copies
            io_util.delete(spark, p)
            if snapshot.in_retained(path, p):
                snapshot.repoint_retained(
                    spark, path, snapshot.retained_rel_of(path, p), None
                )
            dropped += 1
            continue
        tmp = d + f"/.__forget_{uuid.uuid4().hex[:8]}__"
        from shaha_spark.pipeline.build import write_hashdb

        # write_hashdb is the one home of the zstd/bloom writer options
        write_hashdb(remaining.coalesce(1).sortWithinPartitions("hash"), tmp)
        part = next(
            q for q, _ in io_util.list_files(spark, tmp) if q.endswith(".parquet")
        )
        stem = f"forget-{uuid.uuid4().hex[:12]}.zstd.parquet"
        incoming = d + f"/_incoming-{stem}"
        final = d + f"/{stem}"
        if not io_util.rename(spark, part, incoming):
            io_util.delete(spark, tmp)
            raise IOError(f"forget: could not stage {incoming}")
        io_util.write_text_atomic(
            spark,
            incoming + MANIFEST_SUFFIX,
            json.dumps({"originals": [p], "final": final}),
        )
        io_util.delete(spark, p)
        if not io_util.rename(spark, incoming, final):
            raise IOError(
                f"forget: staged file {incoming} not made visible; the "
                "manifest rolls the swap forward on the next run"
            )
        io_util.delete(spark, incoming + MANIFEST_SUFFIX)
        io_util.delete(spark, tmp)
        # erasure reaches HISTORY: a rewritten retained file keeps
        # serving its snapshots under the new stem; a snapshot-referenced
        # visible original is aliased to its replacement, whose content
        # is exactly the original minus the erased rows — the most
        # history erasure law permits
        if snapshot.in_retained(path, p):
            old_rrel = snapshot.retained_rel_of(path, p)
            new_rrel = (
                old_rrel.rsplit("/", 1)[0] + "/" + stem
                if "/" in old_rrel
                else stem
            )
            snapshot.repoint_retained(spark, path, old_rrel, new_rrel)
        else:
            try:
                rel_old = snapshot.rel_of(path, p)
                if rel_old in snap_refs:
                    snapshot.alias_rel(
                        spark, path, rel_old, snapshot.rel_of(path, final)
                    )
            except ValueError:
                pass
        rewritten += 1

    meta = read_sidecar(spark, path)
    if meta is not None and live_rows_deleted:
        write_sidecar(
            spark,
            path,
            total_records=meta["total_records"] - live_rows_deleted,
            algorithms=meta.get("algorithms", []),
            sources=meta.get("sources", []),
            source_hashes=meta.get("source_hashes", []),
        )
    return {
        **{k: plan[k] for k in ("n_digests", "total_files", "candidate_files")},
        "rows_deleted": rows_deleted,
        "live_rows_deleted": live_rows_deleted,
        "files_rewritten": rewritten,
        "files_dropped": dropped,
        "recovered": recovered,
    }


def preimage_digests(
    spark: SparkSession,
    path: str,
    preimages: list[str],
    algorithms: list[str] | None = None,
) -> list[bytes]:
    """Expand preimages into the digests to erase, under every
    algorithm the database holds (or an explicit subset). The algorithm
    list comes from the sidecar, FALLING BACK TO A SCAN when the
    sidecar is missing — the single shared expansion for both the real
    erasure and the CLI dry-run, so the plan can never claim a no-op
    for a run that would delete rows. Digests are computed with the
    engine's own hasher kernels on a tiny in-memory DataFrame — no
    driver-side reimplementation to drift."""
    from shaha_spark.functions.hashers import hash_expr
    from shaha_spark.pipeline.stats import scan_stats

    if algorithms is None:
        meta = read_sidecar(spark, path)
        algorithms = (
            meta["algorithms"] if meta else scan_stats(spark, path)["algorithms"]
        )
    if not preimages or not algorithms:
        return []
    words = spark.createDataFrame([(w,) for w in preimages], "word string")
    return [
        bytes(r.d)
        for algo in algorithms
        for r in words.select(hash_expr(algo, F.col("word")).alias("d")).collect()
    ]


def forget_preimages(
    spark: SparkSession,
    path: str,
    preimages: list[str],
    algorithms: list[str] | None = None,
) -> dict[str, Any]:
    """Erase ``preimages`` under every algorithm the database holds
    (or an explicit subset) — see :func:`preimage_digests`."""
    digests = preimage_digests(spark, path, preimages, algorithms)
    if not digests:
        return _empty_forget_report()
    return forget_digests(spark, path, digests)
