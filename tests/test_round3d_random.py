"""Randomized differential tests for nearest_join and cdc_apply: the
EXACT oracle SQL the driver will run (from _r4_staging) against the
Spark operators, over seeded random event frames with forced ties —
simultaneous click+purchase, equidistant neighbours, same-timestamp
changelog collisions, keys with no match.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

import _r4_staging as staging
from shaha_spark.operators.joins import nearest_join
from shaha_spark.operators.timeseries import cdc_apply

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, tus bigint, "
    "value double, props string"
)

MIN_US = 60_000_000


def _random_events(seed: int, n: int = 500) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        user = rng.randint(1, 8)
        etype = rng.choice(
            ["click", "click", "purchase", "purchase", "error", "view"]
        )
        # dense bursts with forced exact ties and symmetric offsets so
        # the equidistant tiebreak actually fires
        base = rng.choice([0, 5 * MIN_US, 30 * MIN_US, 300 * MIN_US])
        off = rng.choice([0, 0, MIN_US, 2 * MIN_US, -MIN_US, 7 * MIN_US])
        rows.append(
            (
                i,
                user,
                etype,
                max(0, base + off),
                round(rng.uniform(-50, 50), 2),
                "{}",
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_id", "user_id", "event_type", "tus", "value", "props"],
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


ORACLES = staging.oracle_sql_r4()


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_nearest_join_random_differential(spark, seed):
    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf, SCHEMA)
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "tus"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "tus"
    )
    out = nearest_join(
        left, right, "user_id", "tus", tolerance=600_000_000,
        right_value_cols=["event_id"], order_col="event_id",
    )
    _compare(out, _duck(pdf), ORACLES["events_nearest_join"])


@pytest.mark.parametrize("seed", [15, 16, 17])
def test_cdc_snapshot_random_differential(spark, seed):
    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf, SCHEMA)
    changelog = ev.select(
        "user_id",
        "tus",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        "value",
    )
    out = cdc_apply(
        changelog, ["user_id"], "tus", "op", ["value"], "event_id"
    )
    _compare(out, _duck(pdf), ORACLES["events_cdc_snapshot"])
