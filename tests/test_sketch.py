"""HyperLogLog sketch: accuracy envelope and partitioning-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from shaha_spark.operators.sketch import hll_distinct


def test_hll_within_error_envelope(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    est = hll_distinct(df, "k", p=6).collect()[0]["hll_estimate"]
    # p=6 → stderr ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - n) / n < 0.39, est


def test_hll_higher_p_tightens(spark):
    n = 20000
    df = spark.range(n).select(F.col("id").alias("k"))
    est10 = hll_distinct(df, "k", p=10).collect()[0]["hll_estimate"]
    # p=10 → stderr ~3.3%; allow 3 sigma
    assert abs(est10 - n) / n < 0.10, est10


def test_hll_partitioning_invariant(spark):
    df = spark.range(3000).select(F.col("id").alias("k"))
    a = hll_distinct(df.repartition(1), "k").collect()[0]["hll_estimate"]
    b = hll_distinct(df.repartition(16), "k").collect()[0]["hll_estimate"]
    assert a == b  # bit-identical: exact register maxima + exact sum


def test_hll_duplicates_do_not_inflate(spark):
    base = spark.range(1000).select(F.col("id").alias("k"))
    dup = base.union(base).union(base)
    a = hll_distinct(base, "k").collect()[0]["hll_estimate"]
    b = hll_distinct(dup, "k").collect()[0]["hll_estimate"]
    assert a == b
