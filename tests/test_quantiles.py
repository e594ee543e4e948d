"""group_quantiles semantics: quantile_cont / numpy-linear agreement."""

from __future__ import annotations

import numpy as np

from shaha_spark.operators.profile import group_quantiles


def test_group_quantiles_matches_numpy_linear(spark):
    vals_a = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3]
    vals_b = [10.0, 20.0]
    rows = [("a", v) for v in vals_a] + [("b", v) for v in vals_b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: (r["p50"], r["p95"])
        for r in group_quantiles(df, "g", "v", [0.5, 0.95]).collect()
    }
    for g, vals in (("a", vals_a), ("b", vals_b)):
        exp50 = float(np.percentile(vals, 50, method="linear"))
        exp95 = float(np.percentile(vals, 95, method="linear"))
        assert abs(out[g][0] - exp50) < 1e-12, (g, out[g][0], exp50)
        assert abs(out[g][1] - exp95) < 1e-12, (g, out[g][1], exp95)


def test_group_quantiles_single_row_group(spark):
    df = spark.createDataFrame([("solo", 42.0)], "g string, v double")
    row = group_quantiles(df, "g", "v", [0.5]).collect()[0]
    assert row["p50"] == 42.0


def test_group_quantiles_exact_index_no_interpolation(spark):
    # 5 values → p50 target = 2.0 exactly; frac = 0, hi == lo
    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 100)], "g string, v double"
    )
    row = group_quantiles(df, "g", "v", [0.5]).collect()[0]
    assert row["p50"] == 3.0
