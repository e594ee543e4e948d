"""rolling_quantile / seasonal_profile / isotonic_fit semantics:
reference-implementation agreement, degenerate guards, cross-engine
exactness on random data (operators/timeseries.py, classifier.py)."""

from __future__ import annotations

import math
import random

import duckdb
import numpy as np
import pytest

from shaha_spark.operators.classifier import isotonic_fit, isotonic_fit_sql
from shaha_spark.operators.timeseries import (
    rolling_quantile,
    rolling_quantile_sql,
    seasonal_profile,
    seasonal_profile_sql,
)


# ---------------------------------------------------------------- rolling

def _ref_rolling_q(vals: list[float], q: float, w: int) -> list[float]:
    out = []
    for i in range(len(vals)):
        frame = sorted(vals[max(0, i - w + 1) : i + 1])
        rank = max(1, math.ceil(q * len(frame)))
        out.append(frame[rank - 1])
    return out


def test_rolling_quantile_matches_reference(spark):
    rng = random.Random(5)
    vals = [round(rng.gauss(100, 30), 2) for _ in range(50)]
    rows = [("u", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        r["t"]: r["rq"]
        for r in rolling_quantile(df, ["k"], ["t"], "v", q=0.5, window_rows=7)
        .collect()
    }
    ref = _ref_rolling_q(vals, 0.5, 7)
    assert [got[i] for i in range(50)] == ref


def test_rolling_quantile_skips_nulls_before_windowing(spark):
    rows = [("u", 0, 1.0), ("u", 1, None), ("u", 2, 3.0), ("u", 3, 2.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        r["t"]: r["rq"]
        for r in rolling_quantile(df, ["k"], ["t"], "v", q=0.5, window_rows=2)
        .collect()
    }
    # the NULL row is gone; t=2's trailing pair is (1.0, 3.0) -> rank 1
    assert 1 not in got
    assert got[2] == 1.0 and got[3] == 2.0


def test_rolling_quantile_skips_nan_like_null(spark):
    """NaN is NOT NULL — it passes isNotNull, so without the explicit
    ~isnan filter it would enter the frame and could be emitted as the
    quantile, with cross-engine agreement resting on unstated
    NaN-sort conventions (r9 ADVICE). NaN rows are excluded exactly
    like NULL rows — which also matches the streaming twin, whose
    pandas notna() always dropped them."""
    nan = float("nan")
    rows = [("u", 0, 1.0), ("u", 1, nan), ("u", 2, 3.0), ("u", 3, 2.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        r["t"]: r["rq"]
        for r in rolling_quantile(df, ["k"], ["t"], "v", q=0.5, window_rows=2)
        .collect()
    }
    assert 1 not in got
    assert got[2] == 1.0 and got[3] == 2.0
    # and the SQL twin applies the same filter
    con = duckdb.connect()
    con.execute("CREATE TABLE tt (k VARCHAR, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO tt VALUES (?, ?, ?)", rows)
    want = {
        t: rq
        for t, rq in con.execute(
            "SELECT t, rq FROM ("
            + rolling_quantile_sql("tt", ["k"], "t", "v", q=0.5, window_rows=2)
            + ")"
        ).fetchall()
    }
    assert want == got


def test_rolling_quantile_validates_params(spark):
    df = spark.createDataFrame([("u", 0, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError):
        rolling_quantile(df, ["k"], ["t"], "v", q=1.0)
    with pytest.raises(ValueError):
        rolling_quantile(df, ["k"], ["t"], "v", window_rows=0)


def test_rolling_quantile_matches_duckdb_on_random_data(spark):
    rng = random.Random(17)
    rows = [
        ("u%d" % rng.randrange(5), i, round(rng.gauss(0, 1000), 3))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = sorted(
        (r["k"], r["t"], r["rq"])
        for r in rolling_quantile(
            df, ["k"], ["t", "v"], "v", q=0.9, window_rows=10
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE tbl (k VARCHAR, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO tbl VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            rolling_quantile_sql(
                "tbl", ["k"], "t, v", "v", q=0.9, window_rows=10,
                select="k, t",
            )
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------- seasonal

def test_seasonal_profile_reference_and_duckdb(spark):
    rng = random.Random(23)
    # ~40 days of hourly-ish events starting 2024-01-01 (epoch us)
    t0 = 1_704_067_200_000_000
    rows = [
        (t0 + rng.randrange(0, 40 * 86_400) * 1_000_000,
         round(rng.gauss(50, 10), 2))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "tus long, v double")
    got = sorted(
        (r["dow"], r["hod"], r["n"], r["mean_value"], r["seasonal_index"])
        for r in seasonal_profile(df, "tus", "v").collect()
    )
    # reference: plain python means + index
    cells: dict[tuple[int, int], list[float]] = {}
    for tus, v in rows:
        cells.setdefault(((tus // 86_400_000_000 + 4) % 7,
                          (tus // 3_600_000_000) % 24), []).append(v)
    grand = sum(v for vs in cells.values() for v in vs) / len(rows)
    for dow, hod, n, mean_v, idx in got:
        ref = cells[(dow, hod)]
        assert n == len(ref)
        assert abs(mean_v - sum(ref) / n) < 1e-6
        assert abs(idx - (sum(ref) / n) / grand) < 1e-6
    assert sum(r[2] for r in got) == len(rows)
    # cross-engine exact
    con = duckdb.connect()
    con.execute("CREATE TABLE tbl (tus BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO tbl VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(seasonal_profile_sql("tbl", "tus", "v")).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------- isotonic

def _ref_pav(ns: list[int], ys: list[float]) -> list[float]:
    """Weighted pool-adjacent-violators (stack form) over pre-binned
    (weight, mean) pairs — the sequential reference the minimax
    formulation must reproduce."""
    blocks: list[list[float]] = []  # [weight, mean]
    for n, y in zip(ns, ys):
        blocks.append([float(n), y])
        while len(blocks) > 1 and blocks[-2][1] >= blocks[-1][1]:
            w2, y2 = blocks.pop()
            w1, y1 = blocks.pop()
            blocks.append([w1 + w2, (w1 * y1 + w2 * y2) / (w1 + w2)])
    # blocks pooled consecutive bins; rebuild per-bin fits
    fits, bi = [], 0
    for w, y in blocks:
        acc = 0.0
        while acc < w - 1e-9:
            acc += ns[bi]
            fits.append(y)
            bi += 1
    return fits


def test_isotonic_fit_matches_pav_and_is_monotone(spark):
    rng = random.Random(11)
    rows = []
    for _ in range(4000):
        p = rng.random()
        # noisy, mildly non-monotone relationship
        lab = rng.random() < min(1.0, max(0.0, 0.2 + 0.6 * p + rng.gauss(0, 0.2)))
        rows.append((round(p, 6), lab))
    df = spark.createDataFrame(rows, "quality_prob double, label boolean")
    got = sorted(
        (r["bin"], r["n"], r["pos_rate"], r["iso_fit"])
        for r in isotonic_fit(df, "label", bins=32).collect()
    )
    fits = [r[3] for r in got]
    assert fits == sorted(fits), "isotonic output must be non-decreasing"
    ns = [r[1] for r in got]
    raw = [r[2] for r in got]
    # PAV on the per-bin EXACT pos rates (unrounded, rebuilt from n)
    pos = [round(r * n) for r, n in zip(raw, ns)]
    ref = _ref_pav(ns, [p / n for p, n in zip(pos, ns)])
    assert len(ref) == len(fits)
    for a, b in zip(fits, ref):
        assert abs(a - b) < 1e-8
    # weighted mean preservation (PAV invariant)
    assert abs(
        sum(f * n for f, n in zip(fits, ns)) - sum(pos)
    ) < 1e-6


def test_isotonic_fit_already_monotone_is_identity(spark):
    rows = [(0.1, False)] * 8 + [(0.5, True), (0.5, False)] + [(0.9, True)] * 8
    df = spark.createDataFrame(rows, "quality_prob double, label boolean")
    got = {r["bin"]: r for r in isotonic_fit(df, "label", bins=10).collect()}
    assert got[1]["iso_fit"] == 0.0
    assert got[5]["iso_fit"] == 0.5
    assert got[9]["iso_fit"] == 1.0


def test_isotonic_fit_matches_duckdb_on_random_data(spark):
    rng = random.Random(41)
    rows = [
        (round(rng.random(), 6), rng.random() < 0.3 + 0.4 * rng.random())
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "quality_prob double, label boolean")
    got = sorted(
        (r["bin"], r["n"], r["mean_prob"], r["pos_rate"], r["iso_fit"])
        for r in isotonic_fit(df, "label", bins=64).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE sc (p DOUBLE, lab BOOLEAN)")
    con.executemany("INSERT INTO sc VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(isotonic_fit_sql("sc", "lab", "p", bins=64)).fetchall()
    )
    assert got == want
