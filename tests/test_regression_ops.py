"""ols_fit / autocorr semantics: numpy agreement, degenerate guards,
cross-engine exactness on random data (operators/regression.py)."""

from __future__ import annotations

import random

import duckdb
import numpy as np

from shaha_spark.operators.regression import (
    autocorr,
    autocorr_sql,
    ols_fit,
    ols_fit_sql,
)


def test_ols_fit_matches_numpy_polyfit(spark):
    rng = random.Random(7)
    rows = [("g", float(x), round(3.5 * x + 12 + rng.gauss(0, 4), 2))
            for x in range(200)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = ols_fit(df, "g", "x", "y").collect()[0]
    xs = np.array([r[1] for r in rows])
    ys = np.array([r[2] for r in rows])
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(got["slope"] - slope) < 1e-9
    assert abs(got["intercept"] - intercept) < 1e-7
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(got["r2"] - r * r) < 1e-9
    assert got["n"] == 200


def test_ols_fit_degenerate_groups_null(spark):
    """n=1 and constant-x groups have no defined slope; constant-y
    still fits a flat line but r2 is undefined (dy=0)."""
    rows = [
        ("single", 1.0, 5.0),
        ("constx", 2.0, 1.0), ("constx", 2.0, 9.0),
        ("consty", 1.0, 4.0), ("consty", 3.0, 4.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in ols_fit(df, "g", "x", "y").collect()}
    assert out["single"]["slope"] is None
    assert out["constx"]["slope"] is None and out["constx"]["r2"] is None
    assert out["consty"]["slope"] == 0.0
    assert out["consty"]["intercept"] == 4.0
    assert out["consty"]["r2"] is None


def test_ols_fit_matches_duckdb_on_random_data(spark):
    rng = random.Random(31)
    rows = [
        ("g%d" % rng.randrange(3), float(rng.randrange(0, 500)),
         round(rng.gauss(50, 20), 2))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = sorted(
        tuple(repr(v) for v in r) for r in ols_fit(df, "g", "x", "y").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(repr(v) for v in r)
        for r in con.execute(ols_fit_sql("t", "g", "x", "y")).fetchall()
    )
    assert got == want


def test_autocorr_hand_computed_and_sign(spark):
    """A strictly alternating series has lag-1 autocorrelation ≈ −1;
    a monotone ramp has it ≈ +1 (slightly below from pooling)."""
    alt = [("a", 1, float(i), 10.0 if i % 2 == 0 else -10.0) for i in range(40)]
    ramp = [("r", 1, float(i), float(i)) for i in range(40)]
    df = spark.createDataFrame(
        alt + ramp, "g string, uid bigint, t double, v double"
    )
    out = {
        r["g"]: r["autocorr"]
        for r in autocorr(df, ["g", "uid"], ["t"], "v", ["g"]).collect()
    }
    assert out["a"] < -0.99
    assert out["r"] > 0.99


def test_autocorr_degenerate_null(spark):
    """Series of length <= lag yields no pairs (group absent);
    constant series has dy=dx=0 -> NULL autocorr."""
    rows = [("one", 1, 0.0, 5.0), ("const", 1, 0.0, 3.0),
            ("const", 1, 1.0, 3.0), ("const", 1, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, uid bigint, t double, v double")
    out = {r["g"]: r for r in autocorr(df, ["g", "uid"], ["t"], "v", ["g"]).collect()}
    assert "one" not in out
    assert out["const"]["autocorr"] is None
    assert out["const"]["n_pairs"] == 2


def test_autocorr_matches_duckdb_on_random_data(spark):
    rng = random.Random(63)
    rows = []
    for i in range(2000):
        rows.append(
            ("g%d" % (i % 2), i % 37, float(i), round(rng.gauss(0, 9), 2))
        )
    df = spark.createDataFrame(rows, "g string, uid bigint, t double, v double")
    got = sorted(
        tuple(repr(v) for v in r)
        for r in autocorr(df, ["g", "uid"], ["t"], "v", ["g"]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, uid BIGINT, t DOUBLE, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        tuple(repr(v) for v in r)
        for r in con.execute(
            autocorr_sql("t", ["g", "uid"], "t", "v", ["g"])
        ).fetchall()
    )
    assert got == want


def test_autocorr_rejects_bad_lag(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 0.0, 1.0)],
                               "g string, uid bigint, t double, v double")
    with pytest.raises(ValueError, match="lag"):
        autocorr(df, ["g"], ["t"], "v", ["g"], lag=0)
