"""Incremental hash-database build via Structured Streaming.

The reference's closest analogue is its unbounded stdin iterator +
100k-word batching (ref /root/reference/src/source/stdin.rs:26-34,
src/cli/build.rs:16,149-174). The Spark-native generalization: watch a
landing directory for new wordlist files and fold each micro-batch into
the database with the same append-merge semantics as a batch append
(J1) — effectively-once per file: the checkpoint prevents re-delivery
on clean restarts, and a replayed micro-batch (foreachBatch is
at-least-once under mid-batch failure) merges idempotently — the
append-merge is existing-wins keyed on (hash, algorithm) with
array_union'd sources and the replayed batch re-derives the SAME
source name from its batch_id, so re-folding it changes nothing.
(Contrast streaming/ann_ingest.py, whose parquet append is NOT
naturally idempotent and needs its batch_id ledger.)

foreachBatch is the right tool (not a plain streaming sink) because the
merge is a full-outer join against existing state on disk — an
arbitrary batch transformation, which foreachBatch explicitly permits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def incremental_build(
    spark: SparkSession,
    landing_dir: str,
    db_path: str,
    algorithms: list[str],
    *,
    checkpoint_dir: str,
    source_name: str = "stream",
    available_now: bool = False,
    snapshot_each_batch: bool = False,
):
    """Start (and return) the streaming query folding new wordlist files
    into the hash database. ``available_now=True`` drains what is
    currently in the landing dir and stops — the batch-test trigger.

    ``snapshot_each_batch=True`` records a snapshot after every folded
    micro-batch (pipeline/snapshot.py): the database becomes
    time-travelable per ingest commit — the streaming commit-log shape
    a transactional table format provides natively, at the cost of one
    driver-side manifest write per batch (schedule `vacuum` to bound
    retention growth).
    """
    from shaha_spark.pipeline.build import build, words_from_lines

    lines = spark.readStream.text(landing_dir)

    def fold(batch: DataFrame, batch_id: int) -> None:
        # the batch build's own F1 projection — streaming ingest must
        # track its semantics, not re-state them
        words = words_from_lines(batch)
        if words.isEmpty():
            return
        build(
            batch.sparkSession,
            words,
            algorithms,
            db_path,
            source_name=f"{source_name}-batch-{batch_id}",
            append=True,
        )
        if snapshot_each_batch:
            from shaha_spark.pipeline import snapshot as snap

            snap.snapshot_create(
                batch.sparkSession,
                db_path,
                note=f"{source_name}-batch-{batch_id}",
            )

    writer = (
        lines.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
