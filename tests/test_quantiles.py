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


def test_pearson_corr_matches_numpy(spark):
    import numpy as np

    from shaha_spark.operators.profile import pearson_corr

    rng = np.random.default_rng(3)
    x = rng.integers(1, 100, 200).astype(float)
    y = 2.5 * x + rng.normal(0, 10, 200).round(2)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = pearson_corr(df, "x", "y").collect()[0]["pearson_r"]
    expected = float(np.corrcoef(x, y)[0, 1])
    assert abs(r - expected) < 1e-9


def test_pearson_corr_partitioning_invariant(spark):
    from shaha_spark.operators.profile import pearson_corr

    df = spark.range(500).selectExpr(
        "cast(id as double) as x", "cast(id * id as double) as y"
    )
    a = pearson_corr(df.repartition(1), "x", "y").collect()[0]["pearson_r"]
    b = pearson_corr(df.repartition(16), "x", "y").collect()[0]["pearson_r"]
    assert a == b  # bit-identical: decimal sums are order-exact


def test_check_rules_one_pass_and_null_is_violation(spark):
    from shaha_spark.operators.checks import check_rules
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id bigint, v double"
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in check_rules(
            df, {"v_positive": F.col("v") > 0, "id_not_null": F.col("id").isNotNull()}
        ).collect()
    }
    # NULL predicate counts as a violation (conservative gate)
    assert out["v_positive"] == (3, 2, 0)
    assert out["id_not_null"] == (3, 0, 1)
    # single scan: exactly one aggregate over the input, no union of scans
    plan = check_rules(
        df, {"a": F.col("id") > 0, "b": F.col("v") > 0}
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_group_quantile_filter_keeps_at_or_above(spark):
    from shaha_spark.operators.profile import group_quantile_filter

    rows = [("s", float(v)) for v in (1, 2, 3, 4, 100)] + [("t", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = group_quantile_filter(df, "g", "v", 0.25)
    got = {(r["g"], r["v"]) for r in out.collect()}
    # group s: p25 of (1,2,3,4,100) = 2.0 → keeps 2,3,4,100; singleton
    # group t keeps its only row (threshold == the value itself)
    assert got == {("s", 2.0), ("s", 3.0), ("s", 4.0), ("s", 100.0), ("t", 7.0)}
    thr = {r["g"]: r["q_threshold"] for r in out.collect()}
    assert thr["s"] == 2.0 and thr["t"] == 7.0


def test_group_quantile_filter_single_lineage(spark):
    from shaha_spark.operators.profile import group_quantile_filter

    df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "g string, v double")
    plan = group_quantile_filter(df, "g", "v", 0.5)._jdf.queryExecution().executedPlan().toString()
    # windowed threshold, not an aggregate joined back: input scanned once
    assert plan.count("Scan ExistingRDD") == 1 and "Join" not in plan


# ------------------------------------------------------------- KS test


def test_ks_2samp_hand_computed(spark):
    """Tiny ECDFs checked against the closed form: a=(1,2,3), b=(2,3,4)
    -> D = 1/3 at v=1 (A=1/3, B=0)."""
    from shaha_spark.operators.profile import ks_2samp

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ks_2samp(df, "g", "v", "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b) == (3, 3)
    # cum at v=1: (1,0) -> |1*3 - 0*3| = 3; v=2: (2,1) -> 3; v=3: (3,2)
    # -> 3; v=4: (3,3) -> 0. max numerator 3, D = 3/9 = 1/3.
    assert r.d_num == 3
    assert r.d_stat == 3 / 9


def test_ks_2samp_identical_distributions_zero(spark):
    from shaha_spark.operators.profile import ks_2samp

    rows = [("a", float(i % 7)) for i in range(70)] + [
        ("b", float(i % 7)) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_2samp(df, "g", "v", "a", "b").collect()[0]
    assert r.d_num == 0 and r.d_stat == 0.0


def test_ks_2samp_disjoint_distributions_one(spark):
    from shaha_spark.operators.profile import ks_2samp

    rows = [("a", float(i)) for i in range(10)] + [
        ("b", float(100 + i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_2samp(df, "g", "v", "a", "b").collect()[0]
    assert r.d_stat == 1.0 and r.d_num == 10 * 5


def test_ks_2samp_null_values_excluded_and_unequal_sizes(spark):
    from shaha_spark.operators.profile import ks_2samp

    rows = [("a", 1.0), ("a", None), ("b", 1.0), ("b", 2.0), ("b", None), ("c", 9.9)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_2samp(df, "g", "v", "a", "b").collect()[0]
    # a=(1), b=(1,2): cum v=1 (1,1) -> |1*2-1*1| = 1; v=2 (1,2) -> 0
    assert (r.n_a, r.n_b, r.d_num) == (1, 2, 1)
    assert r.d_stat == 1 / 2


def test_ks_2samp_matches_flat_oracle_on_random_data(spark):
    """The bucketed distributed prefix sum must equal DuckDB's flat
    global window on seeded-random data with heavy ties."""
    import random

    import duckdb

    from shaha_spark.operators.profile import ks_2samp, ks_2samp_sql

    rng = random.Random(99)
    rows = [
        ("a" if rng.random() < 0.6 else "b", round(rng.gauss(0, 2), 1))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_2samp(df, "g", "v", "a", "b", n_buckets=16).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(ks_2samp_sql("t", "g", "v", "a", "b")).fetchone()
    assert (got.n_a, got.n_b, got.d_num) == want[:3]
    assert repr(got.d_stat) == repr(want[3])


# ------------------------------------------------- Poisson bootstrap


def test_bootstrap_ci_brackets_true_mean(spark):
    """On a well-behaved sample the 95% CI must bracket the exact mean
    and be a sane width (~ 4 sd / sqrt(n) at most)."""
    import statistics

    from shaha_spark.operators.profile import bootstrap_mean_ci

    vals = [float((i * 37) % 100) for i in range(2000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v double"
    )
    r = bootstrap_mean_ci(df, "v", "id").collect()[0]
    true_mean = sum(vals) / len(vals)
    assert r.n == 2000
    assert abs(r.mean_value - true_mean) < 1e-9
    assert r.ci_lo <= true_mean <= r.ci_hi
    half = 4 * statistics.pstdev(vals) / (len(vals) ** 0.5)
    assert (r.ci_hi - r.ci_lo) < 2 * half


def test_bootstrap_weights_are_poisson1ish(spark):
    """Mean replicate weight must be ~1 (the capped inverse CDF shifts
    it by < 0.004): the replicate means of a CONSTANT column all equal
    that constant, and ci_lo == ci_hi == mean."""
    from shaha_spark.operators.profile import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, 7.25) for i in range(500)], "id bigint, v double"
    )
    r = bootstrap_mean_ci(df, "v", "id").collect()[0]
    assert r.mean_value == 7.25 and r.ci_lo == 7.25 and r.ci_hi == 7.25


def test_bootstrap_null_values_excluded(spark):
    from shaha_spark.operators.profile import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 4.0)], "id bigint, v double"
    )
    r = bootstrap_mean_ci(df, "v", "id").collect()[0]
    assert r.n == 2 and r.mean_value == 3.0


def test_bootstrap_validates_n_reps(spark):
    import pytest

    from shaha_spark.operators.profile import bootstrap_mean_ci

    df = spark.createDataFrame([(1, 2.0)], "id bigint, v double")
    with pytest.raises(ValueError, match="n_reps"):
        bootstrap_mean_ci(df, "v", "id", n_reps=2)


def test_bootstrap_matches_duckdb_on_random_data(spark):
    import random

    import duckdb

    from shaha_spark.operators.profile import (
        bootstrap_mean_ci,
        bootstrap_mean_ci_sql,
    )

    rng = random.Random(4)
    rows = [(i, round(rng.uniform(-50, 150), 2)) for i in range(1500)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = bootstrap_mean_ci(df, "v", "id", n_reps=16).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(bootstrap_mean_ci_sql("t", "v", "id", n_reps=16)).fetchone()
    assert tuple(
        repr(x) if isinstance(x, float) else x for x in got
    ) == tuple(repr(x) if isinstance(x, float) else x for x in want)


# ------------------------------------- ADVICE r6 regression coverage


def test_ks_2samp_empty_group_null_in_both_engines(spark):
    """Degenerate input (one group has zero rows): both engines must
    return a row with NULL d_stat — previously Spark raised ANSI
    DIVIDE_BY_ZERO while the DuckDB twin silently returned NULL."""
    import duckdb

    from shaha_spark.operators.profile import ks_2samp, ks_2samp_sql

    rows = [("a", 1.0), ("a", 2.0), ("c", 9.9)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_2samp(df, "g", "v", "a", "b").collect()
    assert len(got) == 1
    assert (got[0].n_a, got[0].n_b) == (2, 0)
    assert got[0].d_stat is None

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(ks_2samp_sql("t", "g", "v", "a", "b")).fetchone()
    assert (got[0].n_a, got[0].n_b, got[0].d_num, got[0].d_stat) == want


def test_ks_2samp_sql_rejects_non_string_and_quoted_groups():
    import pytest

    from shaha_spark.operators.profile import ks_2samp_sql

    with pytest.raises(ValueError, match="quote-free strings"):
        ks_2samp_sql("t", "g", "v", 1, "b")
    with pytest.raises(ValueError, match="quote-free strings"):
        ks_2samp_sql("t", "g", "v", "a'--", "b")


def test_bootstrap_tiny_n_zero_weight_replicates_cross_engine(spark):
    """n=1 makes P(weight=0) = e^-1 per replicate, so some replicate
    means are undefined. Both engines must coalesce them to the overall
    mean (previously Spark's sort_array put the NULLs FIRST and
    DuckDB's list_sort put them LAST, silently skewing one CI bound to
    NULL on one engine only)."""
    import duckdb

    from shaha_spark.operators.profile import (
        bootstrap_mean_ci,
        bootstrap_mean_ci_sql,
    )

    rows = [(1, 5.0)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = bootstrap_mean_ci(df, "v", "id", n_reps=8).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(bootstrap_mean_ci_sql("t", "v", "id", n_reps=8)).fetchone()
    assert got.ci_lo is not None and got.ci_hi is not None
    assert tuple(
        repr(x) if isinstance(x, float) else x for x in got
    ) == tuple(repr(x) if isinstance(x, float) else x for x in want)
    # with a single 5.0-valued row every defined replicate mean is 5.0
    # and the zero-weight ones coalesce to the mean — the CI collapses
    assert got.ci_lo == 5.0 and got.ci_hi == 5.0


# --------------------------------------------- global discrete quantile


def test_quantile_disc_pins_duckdb_builtin_convention(spark):
    """The rank convention (1-based max(1, ceil(q*n)) — type-1 inverse
    ECDF) must equal DuckDB's built-in quantile_disc, on seeded-random
    data with ties, across awkward q values."""
    import random

    import duckdb

    from shaha_spark.operators.profile import quantile_disc

    rng = random.Random(88)
    vals = [round(rng.gauss(0, 3), 1) for _ in range(2500)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.01, 0.1, 0.25, 0.333, 0.5, 0.51, 0.75, 0.9, 0.99, 1.0]
    row = quantile_disc(df, "v", qs, n_buckets=16).collect()[0].asDict()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    for q in qs:
        want = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        got = row[f"p{round(q * 100)}"]
        assert repr(got) == repr(want), (q, got, want)


def test_quantile_disc_returns_data_elements(spark):
    """Every output is an actual input element (discrete, no
    interpolation), and q=0/1 clamp to min/max."""
    from shaha_spark.operators.profile import quantile_disc

    vals = [10.0, 20.0, 30.0, 40.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = quantile_disc(df, "v", [0.0, 0.25, 0.26, 0.5, 0.75, 1.0]).collect()[0]
    assert row["p0"] == 10.0       # rank clamps to 1
    assert row["p25"] == 10.0      # ceil(0.25*4) = 1
    assert row["p26"] == 20.0      # ceil(1.04) = 2
    assert row["p50"] == 20.0
    assert row["p75"] == 30.0
    assert row["p100"] == 40.0


def test_quantile_disc_degenerate_inputs(spark):
    from shaha_spark.operators.profile import quantile_disc

    # all-NULL input: one row of NULLs in both engines
    df = spark.createDataFrame([(None,), (None,)], "v double")
    row = quantile_disc(df, "v", [0.5]).collect()[0]
    assert row["p50"] is None
    # single distinct value: every quantile is that value
    df1 = spark.createDataFrame([(7.0,)] * 5, "v double")
    row1 = quantile_disc(df1, "v", [0.1, 0.5, 0.9]).collect()[0]
    assert (row1["p10"], row1["p50"], row1["p90"]) == (7.0, 7.0, 7.0)


# --------------------------------------------- weighted reservoir (A-ES)


def test_weighted_reservoir_exact_k_per_stratum(spark):
    from pyspark.sql import functions as F

    from shaha_spark.operators.sampling import weighted_reservoir

    rows = [(i, "s%d" % (i % 3), (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, src string, w bigint")
    out = weighted_reservoir(
        df, k=4, weight_col="w", key_col="id", strata_col="src", salt="t"
    )
    sizes = {r["src"]: r["n"] for r in out.groupBy("src").agg(
        F.count("id").alias("n")
    ).collect()}
    assert sizes == {"s0": 4, "s1": 4, "s2": 4}
    # k > n: the whole (positive-weight) stratum comes back
    tiny = spark.createDataFrame([(1, "a", 2), (2, "a", 3)], "id bigint, src string, w bigint")
    assert weighted_reservoir(
        tiny, k=10, weight_col="w", key_col="id", strata_col="src"
    ).count() == 2


def test_weighted_reservoir_excludes_nonpositive_weights(spark):
    from shaha_spark.operators.sampling import weighted_reservoir

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 9)],
        "id bigint, w bigint",
    )
    got = sorted(
        r["id"]
        for r in weighted_reservoir(df, k=10, weight_col="w", key_col="id").collect()
    )
    assert got == [1, 5]


def test_weighted_reservoir_matches_flat_oracle_global_and_stratified(spark):
    """Two-phase pre-pruned top-k must equal DuckDB's flat window, with
    the full A-ES key compared at repr precision."""
    import random

    import duckdb

    from shaha_spark.operators.sampling import (
        weighted_reservoir,
        weighted_reservoir_sql,
    )

    rng = random.Random(4242)
    rows = [(i, "s%d" % rng.randrange(4), rng.randrange(1, 500)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, src string, w bigint")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, src VARCHAR, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    for strata in (None, "src"):
        got = sorted(
            (r["id"], repr(r["res_key"]))
            for r in weighted_reservoir(
                df, k=7, weight_col="w", key_col="id",
                strata_col=strata, salt="x", prune_buckets=5,
            ).collect()
        )
        want = sorted(
            (int(r[0]), repr(float(r[1])))
            for r in con.execute(
                weighted_reservoir_sql(
                    "t", 7, "w", "id", strata_col=strata, salt="x",
                    select="id, res_key",
                )
            ).fetchall()
        )
        assert got == want, strata


def test_weighted_reservoir_weight_bias(spark):
    """Heavier rows must be sampled more often: split 1000 rows into
    weight-1 and weight-20 halves; a k=100 reservoir should be
    dominated by the heavy half (exact expectation ~95%)."""
    from shaha_spark.operators.sampling import weighted_reservoir

    rows = [(i, 20 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    got = weighted_reservoir(df, k=100, weight_col="w", key_col="id", salt="b")
    heavy = got.where("id < 500").count()
    assert heavy > 80, heavy


# --------------------------------------------------- mutual information


def test_mutual_info_perfect_dependence_is_label_entropy(spark):
    """If B is a function of A with uniform classes, MI = H(A) = ln(k)."""
    import math

    from shaha_spark.operators.profile import mutual_info

    rows = [("c%d" % (i % 4), "d%d" % (i % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_info(df, "a", "b").collect()[0]
    assert abs(got["mi_nats"] - math.log(4)) < 1e-6
    assert got["n"] == 400


def test_mutual_info_independent_is_zero(spark):
    from shaha_spark.operators.profile import mutual_info

    rows = [("a%d" % (i % 2), "b%d" % ((i // 2) % 3)) for i in range(600)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_info(df, "a", "b").collect()[0]
    assert abs(got["mi_nats"]) < 1e-9  # exactly balanced grid


def test_mutual_info_nulls_excluded_and_matches_duckdb(spark):
    import math
    import random

    import duckdb

    from shaha_spark.operators.profile import mutual_info, mutual_info_sql

    rng = random.Random(17)
    rows = []
    for i in range(3000):
        a = "x%d" % rng.randrange(3)
        b = ("y%d" % rng.randrange(4)) if rng.random() > 0.05 else None
        rows.append((a if rng.random() > 0.03 else None, b))
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_info(df, "a", "b").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(mutual_info_sql("t", "a", "b")).fetchone()
    assert repr(got["mi_nats"]) == repr(want[0]) and got["n"] == want[1]
    # python replay for value sanity
    clean = [(a, b) for a, b in rows if a is not None and b is not None]
    n = len(clean)
    from collections import Counter
    o = Counter(clean); ra = Counter(a for a, _ in clean); cb = Counter(b for _, b in clean)
    mi = sum((c / n) * math.log(n * c / (ra[a] * cb[b])) for (a, b), c in o.items())
    assert abs(mi - got["mi_nats"]) < 1e-5
    assert got["n"] == n
