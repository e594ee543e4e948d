"""Randomized differential tests for the time-series family: seeded
random event frames run through the Spark operators AND their DuckDB
oracle SQL (over the same rows registered in-memory), compared with
the driver's normalization. Catches edge cases the fixture can't
reach: simultaneous events, single-event keys, bursty gaps, users
whose attribute never changes.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from shaha_spark.operators.timeseries import (
    debounce,
    debounce_sql,
    gapfill,
    gapfill_sql,
    scd2_intervals,
    scd2_sql,
)

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, tus bigint, "
    "value double, props string"
)

HOUR_US = 3_600_000_000


def _random_events(seed: int, n: int = 400) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        user = rng.randint(1, 6)
        etype = rng.choice(["a", "b", "c"])
        # bursty: cluster most events, sprinkle far-apart ones; force
        # exact-tie timestamps sometimes
        base = rng.choice([0, HOUR_US // 2, 2 * HOUR_US, 7 * HOUR_US])
        tus = base + rng.choice([0, 0, rng.randint(0, 90_000_000), rng.randint(0, 5 * HOUR_US)])
        rows.append(
            (
                i,
                user,
                etype,
                tus,
                round(rng.uniform(-50, 50), 2),
                '{"k": %d}' % rng.randint(0, 3),
            )
        )
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "tus", "value", "props"]
    )


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return v


def _sorted_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(_norm(r[i]) for i in order) for r in rows], key=repr)


def _duck(pdf: pd.DataFrame):
    con = duckdb.connect()
    con.register("raw", pdf)
    con.execute(
        "CREATE VIEW events AS SELECT event_id, user_id, event_type, "
        "make_timestamp(tus) AS ts, value, props FROM raw"
    )
    return con


def _compare(sdf, con, sql):
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(ocols)
    a = _sorted_rows([tuple(r) for r in sdf.collect()], sdf.columns)
    b = _sorted_rows(res.fetchall(), ocols)
    assert a == b


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_debounce_random_differential(spark, seed):
    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf, SCHEMA)
    from pyspark.sql import functions as F

    out = debounce(ev).select(
        "event_id", "user_id", "event_type", F.col("tus").alias("ts_us")
    )
    _compare(out, _duck(pdf), debounce_sql("events"))


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_scd2_random_differential(spark, seed):
    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf, SCHEMA)
    _compare(scd2_intervals(ev), _duck(pdf), scd2_sql("events"))


@pytest.mark.parametrize("seed", [7, 8])
def test_gapfill_random_differential(spark, seed):
    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf, SCHEMA)
    _compare(gapfill(ev), _duck(pdf), gapfill_sql("events"))
