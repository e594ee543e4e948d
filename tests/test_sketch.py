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


# ------------------------------------------------------------- CMS

def test_cms_overcounts_never_under(spark):
    from shaha_spark.operators.sketch import cms_frequencies

    rows = [("apple",)] * 50 + [("pear",)] * 7 + [("kiwi",)] * 1
    rows += [(f"noise{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "w string")
    got = {
        r["item"]: r["cms_count"]
        for r in cms_frequencies(df, "w", ["apple", "pear", "kiwi", "absent"]).collect()
    }
    true = {"apple": 50, "pear": 7, "kiwi": 1, "absent": 0}
    for item, t in true.items():
        assert got[item] >= t, (item, got[item], t)
    # width 256 over ~258 items: collisions possible but bounded
    assert got["apple"] - true["apple"] < 250


def test_cms_partitioning_invariant(spark):
    from shaha_spark.operators.sketch import cms_frequencies

    df = spark.range(500).select((F.col("id") % 13).cast("string").alias("w"))
    a = cms_frequencies(df.repartition(1), "w", ["3", "7"]).collect()
    b = cms_frequencies(df.repartition(16), "w", ["3", "7"]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cms_wide_sketch_is_exact_here(spark):
    from shaha_spark.operators.sketch import cms_frequencies

    rows = [("a",)] * 5 + [("b",)] * 3
    df = spark.createDataFrame(rows, "w string")
    got = {
        r["item"]: r["cms_count"]
        for r in cms_frequencies(df, "w", ["a", "b", "zz"], depth=4, width=65536).collect()
    }
    assert got == {"a": 5, "b": 3, "zz": 0}


# ----------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_low_fp(spark):
    from shaha_spark.operators.sketch import bloom_membership

    corpus = spark.range(300).select(F.concat(F.lit("w"), F.col("id")).alias("w"))
    probes = spark.range(600).select(
        F.col("id").alias("pid"), F.concat(F.lit("w"), F.col("id")).alias("w")
    )
    got = {r["pid"]: r["maybe_in_corpus"] for r in
           bloom_membership(corpus, probes, "w", "pid", m_bits=8192, k=5).collect()}
    # every corpus member flagged maybe (no false negatives)
    assert all(got[i] for i in range(300))
    # 300 items in 8192 bits, k=5 → fp rate ~ (1-e^(-5*300/8192))^5 ≈ 0.01%
    fps = sum(1 for i in range(300, 600) if got[i])
    assert fps <= 5, fps


def test_bloom_partitioning_invariant(spark):
    from shaha_spark.operators.sketch import bloom_membership

    corpus = spark.range(100).select(F.col("id").cast("string").alias("w"))
    probes = spark.range(150).select(
        F.col("id").alias("pid"), F.col("id").cast("string").alias("w")
    )
    a = bloom_membership(corpus.repartition(1), probes, "w", "pid").orderBy("pid").collect()
    b = bloom_membership(corpus.repartition(16), probes, "w", "pid").orderBy("pid").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
