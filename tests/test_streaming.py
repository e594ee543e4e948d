"""Structured Streaming tests: incremental build + watermarked windows."""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import functions as F

from shaha_spark.pipeline.stats import info
from shaha_spark.query import query
from shaha_spark.streaming import incremental_build, watermarked_event_counts


def _drain(q, timeout=120):
    q.awaitTermination(timeout)


def test_incremental_build_drains_landing_dir(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "w1.txt").write_text("password\nhello\n")
    db = str(tmp_path / "db")
    ckpt = str(tmp_path / "ckpt")

    q = incremental_build(
        spark, str(landing), db, ["sha256"],
        checkpoint_dir=ckpt, available_now=True,
    )
    _drain(q)
    assert info(spark, db)["total_records"] == 2

    # second file lands; a new availableNow run picks up ONLY the new file
    # (checkpoint provides exactly-once) and merges it in
    (landing / "w2.txt").write_text("hello\nworld\n")
    q = incremental_build(
        spark, str(landing), db, ["sha256"],
        checkpoint_dir=ckpt, available_now=True,
    )
    _drain(q)
    meta = info(spark, db)
    assert meta["total_records"] == 3  # password, hello, world

    digest = hashlib.sha256(b"hello").hexdigest()
    rows = query(spark, db, digest).collect()
    assert len(rows) == 1
    assert len(rows[0].sources) == 2  # merged from both batches


def test_watermarked_event_counts_semantics_on_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    out = watermarked_event_counts(ev)
    total = out.agg(F.sum("n_events")).head()[0]
    assert total == ev.count()
    row = out.head()
    assert (row.window_end.timestamp() - row.window_start.timestamp()) == 3600


def test_watermarked_counts_runs_as_stream(spark, tmp_path):
    # genuine streaming execution path: file stream -> windowed agg ->
    # memory sink, availableNow
    src = tmp_path / "events_json"
    src.mkdir()
    (src / "part1.json").write_text(
        '{"ts": "2024-01-01T00:05:00.000Z", "event_type": "click"}\n'
        '{"ts": "2024-01-01T00:25:00.000Z", "event_type": "click"}\n'
        '{"ts": "2024-01-01T01:05:00.000Z", "event_type": "view"}\n'
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .json(str(src))
    )
    out = watermarked_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM win_counts").collect()
    # append mode emits only watermark-finalized windows; with a single
    # drain the final window may be withheld — check what did emit
    got = {(r.event_type, r.n_events) for r in rows}
    assert got <= {("click", 2), ("view", 1)}


def test_running_totals_stateful_across_batches(spark, tmp_path):
    # applyInPandasWithState: state must persist across micro-batches
    from shaha_spark.streaming import running_totals

    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"event_type": "click", "value": 1.5}\n'
        '{"event_type": "click", "value": 2.5}\n'
        '{"event_type": "view", "value": 1.0}\n'
    )
    stream = spark.readStream.schema("event_type string, value double").json(str(src))
    out = running_totals(stream)
    ckpt = str(tmp_path / "ckpt")
    collected: list = []

    def drain():
        collected.clear()
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(df.collect())
            )
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    got = {r.key: (r.n_events, r.sum_value) for r in collected}
    assert got == {"click": (2, 4.0), "view": (1, 1.0)}

    # second batch arrives; the checkpointed state store carries totals forward
    (src / "b2.json").write_text('{"event_type": "click", "value": 6.0}\n')
    drain()
    got2 = {r.key: (r.n_events, r.sum_value) for r in collected}
    assert got2["click"] == (3, 10.0)
