"""split_cast_double: cross-engine DECIMAL->DOUBLE determinism.

DuckDB 1.x casts DECIMAL->DOUBLE with TWO roundings (int128 unscaled ->
double, then / 10^scale); the JVM rounds once, correctly. Above 2^53 in
unscaled units the engines can diverge in the last ULP — the r5 sf0.1
oracle sweep caught exactly this in profile_table / profile_lineitem /
profile_correlation (SUM(x^2) over 600k price-sized rows:
2224071148386123.1690 -> DuckDB ...123.0, nearest double ...123.2).

The fix splits the exact unscaled integer into hi/lo parts that BOTH
engines cast exactly, then recombines with a fixed 3-op IEEE sequence.
These tests pin the helper on the original repro value, on sign
handling (Spark pmod vs DuckDB % disagree on negatives), and on the
operators that consume it, at magnitudes past 2^53.
"""

from __future__ import annotations

import tempfile
from decimal import Decimal
from fractions import Fraction
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from shaha_spark.operators.profile import (
    numeric_profile,
    pearson_corr,
    pearson_corr_sql,
    profile_sql,
    split_cast_double,
    split_cast_double_sql,
    welch_t,
    welch_t_sql,
)

# the r4/r5 repro value and friends; unscaled units span both sides of
# 2^53 and both signs
VALUES = [
    "2224071148386123.1690",
    "-2224071148386123.1690",
    "0.0001",
    "-0.0001",
    "0.0000",
    "9007199254740993.0001",  # 2^53 + 1 in the integer part
    "-9007199254740993.0001",
    "31771202123.6000",
]


def test_helper_bitwise_equal_both_engines(spark):
    con = duckdb.connect()
    for v in VALUES:
        sv = spark.sql(
            f"SELECT CAST('{v}' AS DECIMAL(38,4)) AS d"
        ).select(split_cast_double(F.col("d"), 4).alias("v")).collect()[0].v
        dec_expr = "CAST('" + v + "' AS DECIMAL(38,4))"
        dv = con.execute(
            "SELECT " + split_cast_double_sql(dec_expr, 4)
        ).fetchone()[0]
        assert repr(sv) == repr(dv), f"{v}: spark {sv!r} vs duckdb {dv!r}"


def test_repro_value_correctly_rounded(spark):
    """For the r5 repro value the split sequence happens to equal the
    correctly-rounded conversion — the value DuckDB's native cast gets
    wrong."""
    v = "2224071148386123.1690"
    sv = spark.sql(
        f"SELECT CAST('{v}' AS DECIMAL(38,4)) AS d"
    ).select(split_cast_double(F.col("d"), 4).alias("v")).collect()[0].v
    assert sv == float(Fraction(22240711483861231690, 10**4))
    # and DuckDB's native cast is indeed the wrong bit — the reason the
    # helper exists; if a future DuckDB fixes this, the helper still
    # matches (both paths are then correctly rounded for in-range hi)
    naive = duckdb.connect().execute(
        f"SELECT CAST(CAST('{v}' AS DECIMAL(38,4)) AS DOUBLE)"
    ).fetchone()[0]
    assert naive != sv  # documents DuckDB 1.x behavior


@pytest.fixture(scope="module")
def big_mixed(spark):
    """50k mixed-sign price-like decimals whose sum-of-squares unscaled
    value is far beyond 2^53 (~1e21)."""
    random.seed(7)
    # per-value unscaled magnitude stays < 1e9: DuckDB computes the
    # DECIMAL(18,2) square in int64 and overflows past ~1e18 unscaled.
    # 50k squares of ~5e6 still sum to ~1e18 (unscaled ~1e22 >> 2^53).
    rows = [
        (
            i,
            Decimal(random.randrange(-900_000_000, 150_000_000)) / 100,
            Decimal(random.randrange(-600_000_000, 600_000_000)) / 100,
            i % 2,
        )
        for i in range(50_000)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, x decimal(18,2), y decimal(18,2), g int"
    )
    pq = tempfile.mkdtemp(prefix="shaha_splitcast_") + "/t.parquet"
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    return df, con


def _eq(spark_row, duck_row):
    return [repr(float(a)) if a is not None else None for a in spark_row] == [
        repr(float(b)) if b is not None else None for b in duck_row
    ]


def test_numeric_profile_past_2_53(spark, big_mixed):
    df, con = big_mixed
    sp = numeric_profile(df, "x").collect()[0]
    dp = con.execute(profile_sql("t", "x")).fetchone()
    assert _eq(sp, dp), f"{list(sp)} vs {list(dp)}"


def test_pearson_corr_past_2_53(spark, big_mixed):
    df, con = big_mixed
    sc_ = pearson_corr(df, "x", "y").collect()[0]
    dc = con.execute(pearson_corr_sql("t", "x", "y")).fetchone()
    assert _eq(sc_, dc), f"{list(sc_)} vs {list(dc)}"


def test_random_magnitude_sweep(spark):
    """300 seeded-random decimals spanning 1e-4 .. 1e24 unscaled, both
    signs, in ONE Spark job vs ONE DuckDB query — the whole helper
    domain, not just the repro value."""
    rng = random.Random(11)
    vals = []
    for _ in range(300):
        # 1..28 digits: ~1e-4 .. 1e24 unscaled stays in-domain; the top
        # decades cross the 2^53*10^10 guard, exercising the symmetric
        # NULL branch randomly on both engines (r6)
        digits = rng.randrange(1, 29)
        u = rng.randrange(0, 10**digits)
        if rng.random() < 0.5:
            u = -u
        vals.append(Decimal(u) / 10**4)
    df = spark.createDataFrame(
        [(i, str(v)) for i, v in enumerate(vals)], "i int, s string"
    )
    sp = {
        r.i: r.v
        for r in df.select(
            "i",
            split_cast_double(
                F.col("s").cast("decimal(38,4)"), 4
            ).alias("v"),
        ).collect()
    }
    sp = [sp[i] for i in range(len(vals))]
    con = duckdb.connect()
    expr = split_cast_double_sql("CAST(s AS DECIMAL(38,4))", 4)
    con.execute("CREATE TABLE vals (i INT, s VARCHAR)")
    con.executemany(
        "INSERT INTO vals VALUES (?, ?)",
        [(i, str(v)) for i, v in enumerate(vals)],
    )
    dv = [
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM vals ORDER BY i"
        ).fetchall()
    ]
    bad = [
        (v, a, b)
        for v, a, b in zip(vals, sp, dv)
        if repr(a) != repr(b)
    ]
    assert not bad, f"{len(bad)} mismatches; first: {bad[:3]}"


def test_welch_t_past_2_53(spark, big_mixed):
    df, con = big_mixed
    sw = welch_t(df, "g", "x", 0, 1).collect()[0]
    dw = con.execute(welch_t_sql("t", "g", "x", "0", "1")).fetchone()
    assert _eq(sw, dw), f"{list(sw)} vs {list(dw)}"


def test_out_of_domain_is_null_both_engines(spark):
    """r6 domain guard: past u >= 2^53*10^10 the hi part would exceed
    2^53 and bit-equality would silently degrade — both engines must
    return NULL instead (symmetric, loud in output)."""
    from shaha_spark.operators.profile import _SPLIT_LIMIT

    lim = _SPLIT_LIMIT  # unscaled units at scale 4
    cases = {
        str(Decimal(lim - 1) / 10**4): False,   # largest in-domain
        str(Decimal(lim) / 10**4): True,        # first out-of-domain
        str(Decimal(-(lim + 12345)) / 10**4): True,
        str(Decimal(lim * 3) / 10**4): True,
        "1234.5678": False,
    }
    con = duckdb.connect()
    for v, expect_null in cases.items():
        sv = spark.sql(
            f"SELECT CAST('{v}' AS DECIMAL(38,4)) AS d"
        ).select(split_cast_double(F.col("d"), 4).alias("v")).collect()[0].v
        dv = con.execute(
            "SELECT " + split_cast_double_sql(f"CAST('{v}' AS DECIMAL(38,4))", 4)
        ).fetchone()[0]
        if expect_null:
            assert sv is None and dv is None, f"{v}: {sv!r} vs {dv!r}"
        else:
            assert sv is not None and repr(sv) == repr(dv), f"{v}: {sv!r} vs {dv!r}"


def test_null_input_stays_null(spark):
    sv = spark.sql(
        "SELECT CAST(NULL AS DECIMAL(38,4)) AS d"
    ).select(split_cast_double(F.col("d"), 4).alias("v")).collect()[0].v
    dv = duckdb.connect().execute(
        "SELECT " + split_cast_double_sql("CAST(NULL AS DECIMAL(38,4))", 4)
    ).fetchone()[0]
    assert sv is None and dv is None


def test_dec_scale_rejects_unscaled_type_string():
    from shaha_spark.operators.profile import _dec_scale

    import re

    assert _dec_scale("decimal(18,2)") == 2
    for bad in ("double", "decimal", "decimal(18)"):
        with pytest.raises(ValueError, match=re.escape(repr(bad))):
            _dec_scale(bad)
