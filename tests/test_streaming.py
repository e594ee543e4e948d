"""Structured Streaming tests: incremental build + watermarked windows."""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import functions as F

from shaha_spark.pipeline.stats import info
from shaha_spark.query import query
from shaha_spark.streaming import incremental_build, watermarked_event_counts
from shaha_spark.util import normalize_event_ts


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
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
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


def test_stream_exact_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the horizon are
    dropped across micro-batches; state is keyed on the content digest."""
    from shaha_spark.streaming import stream_exact_dedup

    src = tmp_path / "docs"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"doc_id": 1, "text": "alpha beta", "ts": "2024-01-01T00:00:00.000Z"}\n'
        '{"doc_id": 2, "text": "alpha beta", "ts": "2024-01-01T00:01:00.000Z"}\n'
        '{"doc_id": 3, "text": "gamma", "ts": "2024-01-01T00:02:00.000Z"}\n'
    )
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").json(str(src))
    out = stream_exact_dedup(stream, horizon="1 hour")
    ckpt = str(tmp_path / "ckpt")
    collected: list = []

    def drain():
        q = (
            out.writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(r.doc_id for r in collected) == [1, 3]  # doc 2 is a dup of 1

    # a later micro-batch re-sends the same content inside the horizon:
    # the checkpointed digest state still drops it
    (src / "b2.json").write_text(
        '{"doc_id": 4, "text": "alpha beta", "ts": "2024-01-01T00:10:00.000Z"}\n'
        '{"doc_id": 5, "text": "delta", "ts": "2024-01-01T00:11:00.000Z"}\n'
    )
    drain()
    assert sorted(r.doc_id for r in collected) == [1, 3, 5]
    digests = {r.doc_id: r.content_md5 for r in collected}
    import hashlib
    assert digests[1] == hashlib.md5(b"alpha beta").hexdigest()


def test_stream_minhash_signatures_match_batch(spark, tmp_path):
    """The streamed signature values must equal the batch operator's on
    the same documents (same explode + partial-min aggregation shape)."""
    from shaha_spark.operators.dedup import minhash_signatures
    from shaha_spark.streaming import stream_minhash_signatures

    src = tmp_path / "docs"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog", "ts": "2024-01-01T00:00:00.000Z"}\n'
        '{"doc_id": 2, "text": "tiny", "ts": "2024-01-01T00:01:00.000Z"}\n'
    )
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").json(str(src))
    out = stream_minhash_signatures(stream)
    collected: list = []
    # update mode: emit each document's signature as its aggregation
    # updates (append would withhold rows until the watermark passes)
    q = (
        out.writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .outputMode("update").option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    batch_docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "tiny")],
        "doc_id long, text string",
    )
    expected = {r.doc_id: tuple(r[f"mh_{i}"] for i in range(16))
                for r in minhash_signatures(batch_docs).collect()}
    got = {r.doc_id: tuple(r[f"mh_{i}"] for i in range(16)) for r in collected}
    assert got == expected
    assert got[2] == (2_147_483_647,) * 16  # shingle-less doc -> all-sentinel


def test_sliding_windows_cover_each_event_n_times(spark, sf_dir):
    from shaha_spark.streaming import sliding_event_counts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    out = sliding_event_counts(
        ev, window_duration="1 hour", slide_duration="15 minutes"
    )
    total = out.agg(F.sum("n_events")).head()[0]
    assert total == ev.count() * 4  # every event in window/slide buckets


def test_session_windows_match_batch_sessionize(spark):
    from shaha_spark.streaming import session_event_counts

    # user 1: two events 10 min apart (one session), then a 2h gap (new
    # session); user 2: one event
    rows = [
        (1, "2024-01-01T00:00:00"),
        (1, "2024-01-01T00:10:00"),
        (1, "2024-01-01T02:10:00"),
        (2, "2024-01-01T05:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = session_event_counts(ev, gap="30 minutes")
    got = {
        (r.user_id, r.n_events, r.session_start.isoformat())
        for r in out.collect()
    }
    assert got == {
        (1, 2, "2024-01-01T00:00:00"),
        (1, 1, "2024-01-01T02:10:00"),
        (2, 1, "2024-01-01T05:00:00"),
    }


def test_session_windows_run_as_stream(spark, tmp_path):
    from shaha_spark.streaming import session_event_counts

    src = tmp_path / "sess_json"
    src.mkdir()
    (src / "p1.json").write_text(
        '{"ts": "2024-01-01T00:00:00.000Z", "user_id": 1}\n'
        '{"ts": "2024-01-01T00:10:00.000Z", "user_id": 1}\n'
        '{"ts": "2024-01-01T09:00:00.000Z", "user_id": 9}\n'
    )
    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint").json(str(src))
    )
    out = session_event_counts(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_counts").collect()
    got = {(r.user_id, r.n_events) for r in rows}
    # append mode: only sessions finalized by the watermark emit; the
    # user-9 event advances the watermark past user 1's session
    assert got <= {(1, 2), (9, 1)}
    assert (1, 2) in got  # the early session must have been finalized


def test_stream_stream_window_join(spark, tmp_path):
    from shaha_spark.streaming.joins import stream_window_join

    lsrc = tmp_path / "purchases"
    rsrc = tmp_path / "signups"
    lsrc.mkdir(); rsrc.mkdir()
    (lsrc / "p.json").write_text(
        '{"ts": "2024-01-01T00:20:00.000Z", "user_id": 1, "amount": 9.5}\n'
        '{"ts": "2024-01-01T02:00:00.000Z", "user_id": 1, "amount": 4.0}\n'
        '{"ts": "2024-01-01T00:20:00.000Z", "user_id": 2, "amount": 7.0}\n'
    )
    (rsrc / "s.json").write_text(
        '{"ts": "2024-01-01T00:00:00.000Z", "user_id": 1}\n'
        '{"ts": "2024-01-01T00:10:00.000Z", "user_id": 3}\n'
    )
    purchases = spark.readStream.schema(
        "ts timestamp, user_id bigint, amount double"
    ).json(str(lsrc))
    signups = spark.readStream.schema("ts timestamp, user_id bigint").json(str(rsrc))
    joined = stream_window_join(
        purchases, signups, "user_id", max_delay="30 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT l_key, l_amount FROM ssj").collect()
    got = {(r.l_key, r.l_amount) for r in rows}
    # user 1's 00:20 purchase joins the 00:00 signup (20 min <= 30 min);
    # the 02:00 purchase is outside the window; user 2 has no signup;
    # user 3's signup has no purchase
    assert got == {(1, 9.5)}


def test_stream_curate_matches_batch_byte_for_byte(spark, tmp_path):
    """The stateless curation stage (mixture admit + redaction) must
    produce identical rows on a stream and on the same data as a batch
    — hash membership and regex rewrites are batch-invariant."""
    from shaha_spark.streaming.curation import stream_curate

    src = tmp_path / "docs"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            f'{{"doc_id": {i}, "lang": "{l}", "text": "contact u{i}@example.com id {i}00"}}'
            for i, l in enumerate(["en", "de", "fr", "en", "en", "de", "fr", "en"])
        )
    )
    rates = {"en": 0.5, "de": 1.0, "fr": 0.0}
    schema = "doc_id long, lang string, text string"

    batch = spark.read.schema(schema).json(str(src))
    expected = sorted(
        (r["doc_id"], r["redacted"], r["n_email"], r["n_number"])
        for r in stream_curate(batch, mix_rates=rates).collect()
    )
    assert expected, "rates must admit at least one doc"
    assert all("<email>" in t for _, t, _, _ in expected)
    assert not any(any(c.isdigit() for c in t) for _, t, _, _ in expected)

    stream = spark.readStream.schema(schema).json(str(src))
    out = stream_curate(stream, mix_rates=rates)
    assert out.isStreaming
    collected: list = []
    q = (
        out.writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["redacted"], r["n_email"], r["n_number"]) for r in collected
    )
    assert got == expected


def test_incremental_build_snapshots_each_batch(spark, tmp_path):
    """Streaming ingest with per-batch snapshots: every drained
    micro-batch leaves a time-travelable version; reading version 1
    after a second batch returns exactly the first batch's rows."""
    from shaha_spark.pipeline import snapshot as snap

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "w1.txt").write_text("alpha\nbeta\n")
    db = str(tmp_path / "db")
    ckpt = str(tmp_path / "ckpt")

    q = incremental_build(
        spark, str(landing), db, ["sha256"],
        checkpoint_dir=ckpt, available_now=True, snapshot_each_batch=True,
    )
    _drain(q)
    assert [m["version"] for m in snap.snapshot_list(spark, db)] == [1]

    (landing / "w2.txt").write_text("gamma\n")
    q = incremental_build(
        spark, str(landing), db, ["sha256"],
        checkpoint_dir=ckpt, available_now=True, snapshot_each_batch=True,
    )
    _drain(q)
    assert [m["version"] for m in snap.snapshot_list(spark, db)] == [1, 2]
    assert info(spark, db)["total_records"] == 3
    v1 = snap.read_snapshot(spark, db, 1)
    assert sorted(r.preimage for r in v1.collect()) == ["alpha", "beta"]
    v2 = snap.read_snapshot(spark, db, 2)
    assert sorted(r.preimage for r in v2.collect()) == ["alpha", "beta", "gamma"]


def test_stream_ewma_bit_matches_batch_across_batches(spark, tmp_path):
    """The streamed EWMA must be BIT-identical to the batch operator on
    the same inputs in the same order — including values that span the
    micro-batch boundary (state carries the lag ring across drains)."""
    import json

    from shaha_spark.operators.timeseries import ewma
    from shaha_spark.streaming import stream_ewma

    rows = [
        {"user_id": u, "event_id": i, "value": float((7 * i + u) % 23 + 1)}
        for i in range(14)
        for u in (1, 2)
    ]
    src = tmp_path / "ev"
    src.mkdir()
    # split mid-series so later rows depend on state from batch 1
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in rows if r["event_id"] < 8)
    )
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, value double"
    ).json(str(src))
    out = stream_ewma(stream, alpha=0.25, horizon=4)
    ckpt = str(tmp_path / "ckpt")
    collected: list = []

    def drain():
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(df.collect())
            )
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    (src / "b2.json").write_text(
        "\n".join(json.dumps(r) for r in rows if r["event_id"] >= 8)
    )
    drain()
    streamed = {(r.key, r.order_id): r.ewma for r in collected}

    batch_df = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["value"]) for r in rows],
        "user_id bigint, event_id bigint, value double",
    )
    batch = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma(
            batch_df, ["user_id"], ["event_id"], "value", alpha=0.25, horizon=4
        ).collect()
    }
    assert set(streamed) == set(batch)
    diffs = [k for k in batch if repr(streamed[k]) != repr(batch[k])]
    assert not diffs, diffs[:5]


def test_stream_ewma_null_values_dropped(spark, tmp_path):
    from shaha_spark.streaming import stream_ewma

    src = tmp_path / "evn"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"user_id": 1, "event_id": 1, "value": 10.0}\n'
        '{"user_id": 1, "event_id": 2, "value": null}\n'
        '{"user_id": 1, "event_id": 3, "value": 30.0}\n'
    )
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, value double"
    ).json(str(src))
    collected: list = []
    q = (
        stream_ewma(stream, alpha=0.5, horizon=4)
        .writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.order_id: r.ewma for r in collected}
    assert set(got) == {1, 3}
    # event 3 sees event 1 as its lag-1 (the NULL row never entered state)
    assert abs(got[3] - (0.5 * 30 + 0.25 * 10) / 0.75) < 1e-12


def test_stream_ewma_string_key(spark, tmp_path):
    """Output key/order field types come from the input schema — a
    string user key must work (r8 ADVICE: the hardcoded bigint
    outputStructType broke or nulled non-bigint keys)."""
    from shaha_spark.streaming import stream_ewma

    src = tmp_path / "evs"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"user_id": "alice", "event_id": 1, "value": 10.0}\n'
        '{"user_id": "alice", "event_id": 2, "value": 20.0}\n'
        '{"user_id": "bob", "event_id": 1, "value": 5.0}\n'
    )
    stream = spark.readStream.schema(
        "user_id string, event_id bigint, value double"
    ).json(str(src))
    collected: list = []
    q = (
        stream_ewma(stream, alpha=0.5, horizon=4)
        .writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.key, r.order_id): r.ewma for r in collected}
    assert set(got) == {("alice", 1), ("alice", 2), ("bob", 1)}
    assert got[("alice", 1)] == 10.0
    assert abs(got[("alice", 2)] - (0.5 * 20 + 0.25 * 10) / 0.75) < 1e-12
    assert got[("bob", 1)] == 5.0


def test_stream_rolling_quantile_bit_matches_batch_across_batches(
    spark, tmp_path
):
    """The streamed rolling quantile must be BIT-identical to the batch
    operator on the same inputs in the same order — including frames
    spanning the micro-batch boundary (state carries the W-1 ring)."""
    import json

    from shaha_spark.operators.timeseries import rolling_quantile
    from shaha_spark.streaming import stream_rolling_quantile

    rows = [
        {"user_id": u, "event_id": i, "value": float((11 * i + 3 * u) % 29 + 1)}
        for i in range(15)
        for u in (1, 2)
    ]
    rows[4]["value"] = None  # NULL dropped identically in both paths
    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in rows if r["event_id"] < 9)
    )
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, value double"
    ).json(str(src))
    out = stream_rolling_quantile(stream, q=0.5, window_rows=5)
    ckpt = str(tmp_path / "ckpt")
    collected: list = []

    def drain():
        qy = (
            out.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(df.collect())
            )
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        qy.awaitTermination(120)

    drain()
    (src / "b2.json").write_text(
        "\n".join(json.dumps(r) for r in rows if r["event_id"] >= 9)
    )
    drain()
    streamed = {(r.key, r.order_id): r.rq for r in collected}

    batch_df = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["value"]) for r in rows],
        "user_id bigint, event_id bigint, value double",
    )
    batch = {
        (r["user_id"], r["event_id"]): r["rq"]
        for r in rolling_quantile(
            batch_df, ["user_id"], ["event_id"], "value", q=0.5, window_rows=5
        ).collect()
    }
    assert set(streamed) == set(batch)
    diffs = [k for k in batch if repr(streamed[k]) != repr(batch[k])]
    assert not diffs, diffs[:5]


def test_stream_rolling_quantile_high_q_and_warmup(spark, tmp_path):
    """q=0.9 exercises the non-median rank path; a single short batch
    exercises the warmup (frame shorter than W) rows only."""
    import json

    from shaha_spark.operators.timeseries import rolling_quantile
    from shaha_spark.streaming import stream_rolling_quantile

    rows = [
        {"user_id": "a", "event_id": i, "value": float(50 - 3 * i)}
        for i in range(4)
    ]
    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "user_id string, event_id bigint, value double"
    ).json(str(src))
    out = stream_rolling_quantile(stream, q=0.9, window_rows=10)
    collected: list = []
    qy = (
        out.writeStream.foreachBatch(
            lambda df, _bid: collected.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    qy.awaitTermination(120)
    streamed = {(r.key, r.order_id): r.rq for r in collected}
    batch_df = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["value"]) for r in rows],
        "user_id string, event_id bigint, value double",
    )
    batch = {
        (r["user_id"], r["event_id"]): r["rq"]
        for r in rolling_quantile(
            batch_df, ["user_id"], ["event_id"], "value", q=0.9, window_rows=10
        ).collect()
    }
    assert streamed == batch  # string key + exact element equality
