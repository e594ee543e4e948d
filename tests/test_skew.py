"""Measured skew resilience for the per-user window path (sessionize).

SCALE.md claims the sessionize/rolling shape tolerates realistic key
skew because (a) the per-user window work is tiny codegen'd state per
row, and (b) AQE splits oversized shuffle partitions so a hot user
shares an executor with fewer cold ones. This test PROVES the claim at
test scale instead of asserting it in prose: one user holding 10% of
all events must not push wall-time past 2x the uniform-key layout on
the same row count.

The per-user window itself is inherently sequential per key — the hot
user's 10% slice is the theoretical floor — so the 2x bound holds only
if nothing else (partition placement, spill, stragglers) compounds it.
That compounding is exactly what the test would catch.
"""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

N_ROWS = 1_000_000
N_USERS = 1_000
SESSION_GAP_US = 1_800 * 1_000_000


def _sessionize(ev):
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tus").alias("start_us"),
        F.max("tus").alias("end_us"),
    )


def _events(spark, skewed: bool):
    base = spark.range(N_ROWS).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 7_000_000 % 86_400_000_000).alias("tus"),
    )
    if skewed:
        # id % 10 == 0 -> user 0 (10% of all rows); rest uniform
        user = F.when(F.col("event_id") % 10 == 0, F.lit(0)).otherwise(
            F.col("event_id") % N_USERS
        )
    else:
        user = F.col("event_id") % N_USERS
    return base.withColumn("user_id", user.cast("bigint"))


def _run(spark, skewed: bool) -> float:
    t0 = time.perf_counter()
    _sessionize(_events(spark, skewed)).count()
    return time.perf_counter() - t0


def test_sessionize_hot_user_within_2x_of_uniform(spark):
    _run(spark, skewed=False)  # warm codegen/shuffle machinery once
    uniform = min(_run(spark, skewed=False) for _ in range(3))
    skewed = min(_run(spark, skewed=True) for _ in range(3))
    n_hot = _events(spark, skewed=True).filter(F.col("user_id") == 0).count()
    assert n_hot == N_ROWS // 10
    assert skewed <= 2.0 * uniform + 0.5, (
        f"hot-user layout {skewed:.2f}s vs uniform {uniform:.2f}s "
        f"(> 2x + scheduling slack): skew mitigation regressed"
    )


def test_nearest_join_hot_user_within_2x_of_uniform(spark):
    """nearest_join shares sessionize's plan shape (one shuffle on the
    key, per-key ordered windows), so the same measured skew bound
    must hold: a user owning 10% of both sides stays within 2x of the
    uniform layout."""
    from shaha_spark.operators.joins import nearest_join

    def run(skewed: bool) -> float:
        ev = _events(spark, skewed)
        left = ev.filter(F.col("event_id") % 3 == 0).select(
            "user_id", "event_id", "tus"
        )
        right = ev.filter(F.col("event_id") % 3 == 1).select(
            "user_id", "event_id", "tus"
        )
        t0 = time.perf_counter()
        nearest_join(
            left, right, "user_id", "tus", tolerance=3_600_000_000,
            right_value_cols=["event_id"], order_col="event_id",
        ).count()
        return time.perf_counter() - t0

    run(False)  # warm
    uniform = min(run(False) for _ in range(3))
    skewed = min(run(True) for _ in range(3))
    assert skewed <= 2.0 * uniform + 0.5, (
        f"hot-user nearest_join {skewed:.2f}s vs uniform {uniform:.2f}s"
    )
