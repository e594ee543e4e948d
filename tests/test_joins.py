"""As-of and interval join semantics + plan-shape checks.

The reference engine has no time-series join surface (SURVEY.md §2
extension set); semantics here follow the common as-of contract
(pandas.merge_asof / DuckDB ASOF JOIN): most recent right row at or
before the left row, per key, inclusive on equal timestamps.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from shaha_spark.operators.joins import (
    asof_join,
    dedup_keep_latest,
    interval_join,
)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 50, "d"), (3, 7, "e")],
        "k bigint, t bigint, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 60, 600.0)],
        "k bigint, t bigint, rv double",
    )
    return left, right


def test_asof_join_most_recent_at_or_before(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "t", ["rv"])
    rows = {r["lv"]: (r["asof_t"], r["asof_rv"]) for r in out.collect()}
    assert rows["a"] == (10, 100.0)  # equal timestamp is inclusive
    assert rows["b"] == (15, 150.0)  # most recent, not first
    assert rows["c"] == (None, None)  # before any right row
    assert rows["d"] == (None, None)  # right row is later
    assert rows["e"] == (None, None)  # key absent on right
    assert out.count() == left.count()  # left join: no row loss


def test_asof_join_null_right_value_does_not_leak_older_row(spark):
    # A matched right row whose value column is null must yield null,
    # not the previous non-null value (struct packing guarantees this).
    left = spark.createDataFrame([(1, 30)], "k bigint, t bigint")
    right = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, None)], "k bigint, t bigint, rv string"
    )
    out = asof_join(left, right, "k", "t", ["rv"]).collect()[0]
    assert out["asof_t"] == 20
    assert out["asof_rv"] is None


def test_dedup_keep_latest_breaks_ties(spark):
    right = spark.createDataFrame(
        [(1, 10, 7, "lo"), (1, 10, 9, "hi"), (1, 20, 1, "x")],
        "k bigint, t bigint, seq bigint, v string",
    )
    out = dedup_keep_latest(right, ["k", "t"], "seq")
    assert {(r["t"], r["v"]) for r in out.collect()} == {(10, "hi"), (20, "x")}


def test_asof_plan_single_shuffle_no_join(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, "k", "t", ["rv"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_half_open_bounds(spark):
    events = spark.createDataFrame(
        [(1, 100, "at_start"), (1, 199, "inside"), (1, 200, "at_end"), (1, 99, "before")],
        "k bigint, t bigint, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, 100, 200, "iv")], "k bigint, start_us bigint, end_us bigint, name string"
    )
    out = interval_join(events, intervals, "k", "t", max_len=100)
    assert {r["tag"] for r in out.collect()} == {"at_start", "inside"}


def test_interval_join_across_bucket_boundary(spark):
    # Interval [150, 240) spans buckets 1 and 2 at W=100; events in each
    # bucket must both match, and no duplicate rows may appear.
    events = spark.createDataFrame(
        [(1, 160), (1, 230), (1, 250)], "k bigint, t bigint"
    )
    intervals = spark.createDataFrame(
        [(1, 150, 240)], "k bigint, start_us bigint, end_us bigint"
    )
    out = interval_join(events, intervals, "k", "t", max_len=100)
    assert sorted(r["t"] for r in out.collect()) == [160, 230]


def test_interval_join_requires_max_len(spark):
    events = spark.createDataFrame([(1, 1)], "k bigint, t bigint")
    with pytest.raises(ValueError):
        interval_join(events, events, "k", "t")


def test_interval_join_is_equi_join(spark):
    events = spark.createDataFrame([(1, 160)], "k bigint, t bigint")
    intervals = spark.createDataFrame(
        [(1, 150, 240)], "k bigint, start_us bigint, end_us bigint"
    )
    plan = (
        interval_join(events, intervals, "k", "t", max_len=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # candidate generation is a hash equi-join, never NestedLoop/Cartesian
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_asof_join_matches_pandas_merge_asof(spark):
    # randomized cross-check against the reference implementation
    # (pandas.merge_asof, direction="backward" == our semantics);
    # fixed seeds keep the test deterministic
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for _ in range(3):
        left = pd.DataFrame({
            "k": rng.integers(0, 5, 40),
            "t": rng.integers(0, 1000, 40),
        }).drop_duplicates(["k", "t"])
        right = pd.DataFrame({
            "k": rng.integers(0, 5, 30),
            "t": rng.integers(0, 1000, 30),
            "rv": rng.normal(size=30),
        }).drop_duplicates(["k", "t"])
        expected = pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("t"),
            on="t", by="k", direction="backward", suffixes=("", "_r"),
        )
        exp = {
            (r.k, r.t): (None if pd.isna(r.rv) else round(r.rv, 9))
            for r in expected.itertuples()
        }
        out = asof_join(
            spark.createDataFrame(left.astype("int64")),
            spark.createDataFrame(right),
            "k", "t", ["rv"],
        ).collect()
        got = {
            (r["k"], r["t"]): (None if r["asof_rv"] is None else round(r["asof_rv"], 9))
            for r in out
        }
        assert got == exp


def test_interval_join_matches_naive_range_join(spark):
    # bucketed candidates + refinement must equal the plain quadratic
    # range join on randomized data (fixed seed)
    import numpy as np

    rng = np.random.default_rng(11)
    events = spark.createDataFrame(
        [(int(k), int(t)) for k, t in zip(
            rng.integers(0, 4, 120), rng.integers(0, 2000, 120))],
        "k bigint, t bigint",
    ).distinct()
    iv = []
    for i in range(25):
        start = int(rng.integers(0, 1900))
        iv.append((int(rng.integers(0, 4)), start, start + int(rng.integers(1, 150)), i))
    intervals = spark.createDataFrame(
        iv, "k bigint, start_us bigint, end_us bigint, iv_id bigint"
    )
    got = {
        (r["k"], r["t"], r["iv_id"])
        for r in interval_join(events, intervals, "k", "t", max_len=150).collect()
    }
    naive = {
        (r["k"], r["t"], r["iv_id"])
        for r in events.alias("e").join(
            intervals.alias("i"),
            (F.col("e.k") == F.col("i.k"))
            & (F.col("e.t") >= F.col("i.start_us"))
            & (F.col("e.t") < F.col("i.end_us")),
        ).select(F.col("e.k").alias("k"), "t", "iv_id").collect()
    }
    assert got == naive and len(naive) > 15  # 23 matches at this seed


def test_point_in_time_join_gapped_history_and_prehistory(spark):
    from shaha_spark.operators.joins import point_in_time_join

    # history with a HOLE: [100,200) then [300,None) — 250 is uncovered
    dim = spark.createDataFrame(
        [(1, "a", 100, 200), (1, "b", 300, None), (2, "z", 50, None)],
        "user_id bigint, attr string, valid_from_us bigint, valid_to_us bigint",
    )
    facts = spark.createDataFrame(
        [(10, 1, 50), (11, 1, 150), (12, 1, 250), (13, 1, 300), (14, 2, 60)],
        "event_id bigint, user_id bigint, ts_us bigint",
    )
    out = {
        r.event_id: (r.pit_attr, r.pit_valid_from_us)
        for r in point_in_time_join(
            facts, dim, "user_id", "ts_us", ["attr"]
        ).collect()
    }
    assert out[10] == (None, None)        # before any interval
    assert out[11] == ("a", 100)          # inside [100,200)
    assert out[12] == (None, None)        # in the hole: expired, not "a"
    assert out[13] == ("b", 300)          # valid_from inclusive
    assert out[14] == ("z", 50)
