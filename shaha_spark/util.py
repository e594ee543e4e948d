"""Small plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-local TIMESTAMP
    regardless of how the parquet writer encoded it.

    Three encodings appear in the wild (and across regenerations of the
    test fixtures): TIMESTAMP(NANOS) read as raw int64 under
    ``spark.sql.legacy.parquet.nanosAsLong`` (Spark's reader has no
    nanosecond timestamp type), plain micros TIMESTAMP_NTZ, and an
    already-local TIMESTAMP. The nanos path truncates ns → us, the same
    coercion DuckDB applies, so downstream epoch-microsecond math
    (`unix_micros`) agrees with ``epoch_us(ts)`` on the oracle side;
    the NTZ path reinterprets the wall-clock in the session timezone
    (callers pin UTC), which is exactly DuckDB's naive-timestamp view.
    """
    from pyspark.sql import functions as F

    kind = dict(df.dtypes)[ts_col]
    if kind == "bigint":
        # integer DIV, not `/`: float division of int64 nanos loses
        # precision past 2^53 and would shift timestamps by whole micros
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` DIV 1000"))
        )
    if kind == "timestamp_ntz":
        # The NTZ -> TIMESTAMP cast reinterprets the wall clock in the
        # session timezone; any zone other than UTC would silently shift
        # every derived epoch-microsecond value, so pin it here rather
        # than trusting each caller to.
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


#: Bytes of (optimizer-estimated) input per repartition target partition.
#: Measured on the shingle/hash operators (optimization round 13,
#: local[32]): a 3.5 MB corpus is FASTER single-task than split 32 ways
#: (simhash 0.52 vs 0.81 s — the round-robin exchange plus its
#: sort-before-repartition cost more than 32-way hashing saves), while a
#: 35 MB corpus is fastest around 8-9 tasks (0.99 s vs 1.62 single-task
#: vs 1.27 at 32). 4 MiB/task sits on that measured optimum and keeps
#: per-task work well above task-launch overhead. Parameterized for
#: clusters via SHAHA_PARALLELISM_CHUNK_BYTES; the defaultParallelism
#: clamp and the existing no-op guard keep real-volume behavior
#: unchanged (a big scan already has more partitions than the target).
_DEFAULT_CHUNK_BYTES = 4 * 1024 * 1024


def ensure_parallelism(
    df: DataFrame,
    min_parts: int | None = None,
    chunk_bytes: int | None = None,
) -> DataFrame:
    """Spread CPU-heavy per-row work across the cluster when the input
    arrives under-partitioned (e.g. one small parquet/text file → one
    task doing all the hashing/shingling on one core). No-op when the
    scan already has ≥ target partitions — i.e. at real data volumes,
    where repartitioning the raw input would be a catastrophic extra
    shuffle.

    The target is SIZE-DERIVED (optimization round 13, guide §2):
    ceil(estimated input bytes / 4 MiB), clamped to defaultParallelism
    — not the bare core count. The old target of defaultParallelism
    split any undersized input into exactly <cores> slivers, so (a) a
    corpus small enough to hash in one task paid a round-robin
    exchange (plus Spark's sort-before-repartition) for nothing —
    measured 0.81 → 0.52 s on sf0.1 simhash at local[32] — and (b) the
    cost SCALED WITH THE CORE COUNT, which is exactly the
    tuned-to-local[N] dependence the bench's 8-vs-32-core ratios
    flagged (three queries ran faster at 8 cores). The size estimate
    is the optimizer's driver-side sizeInBytes for the plan (file
    bytes for parquet scans — no job runs); when it is unavailable or
    absurd (Catalyst's unknown-stats sentinel), the clamp restores the
    old defaultParallelism target.

    ``chunk_bytes`` lets an operator state its own per-task appetite:
    the optimum is per-byte-CPU-dependent — the regex-heavy textops
    scorers measured fastest near 0.5 MB/task (quality_score at sf0.1:
    0.70 s at 8 tasks vs 0.95 single-task vs 1.07 at 32) while the
    shingle/simhash operators prefer ≥4 MB (see _DEFAULT_CHUNK_BYTES).
    The env override wins over both when set.
    """
    import math
    import os

    sc = df.sparkSession.sparkContext
    if min_parts is not None:
        target = min_parts
    else:
        target = sc.defaultParallelism
        try:
            size = int(
                str(
                    df._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            )
        except Exception:
            size = -1
        if size >= 0:
            chunk = int(
                os.environ.get(
                    "SHAHA_PARALLELISM_CHUNK_BYTES",
                    chunk_bytes or _DEFAULT_CHUNK_BYTES,
                )
            )
            target = max(1, min(target, math.ceil(size / max(chunk, 1))))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
