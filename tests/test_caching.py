"""Cache lifecycle (shaha_spark/caching.py; r9 ADVICE): operators
that persist() a multi-consumer intermediate register it on the
DataFrame they return, and release() drops the CacheManager entry —
so repeated operator calls do not accumulate executor memory and
plan-equal cached fragments stop leaking into unrelated later plans.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from shaha_spark.caching import registers, release


def _catalog_cached(spark, df) -> bool:
    return df.storageLevel != StorageLevel.NONE


def test_registers_and_release_roundtrip(spark):
    df = spark.range(10)
    inter = df.select((F.col("id") * 2).alias("x")).persist()
    result = registers(inter.groupBy().agg(F.sum("x").alias("s")), inter)
    assert result.collect()[0].s == 90
    assert _catalog_cached(spark, inter)
    assert release(result) == 1
    assert not _catalog_cached(spark, inter)
    # idempotent: the registration is cleared
    assert release(result) == 0
    # the result stays usable after release (recomputes from source)
    assert result.collect()[0].s == 90


def test_basket_rules_release_drops_cache(spark, sf_dir):
    from shaha_spark.operators.basket import basket_rules

    spark.catalog.clearCache()  # isolate from other tests' registrations
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    rules = basket_rules(li, "l_orderkey", "l_partkey", top=5)
    assert rules.count() <= 5
    assert release(rules) == 1
    # the session cache no longer holds the baskets relation
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "basket intermediate still registered"


def test_isotonic_fit_is_lazy_and_releasable(spark, sf_dir):
    """persist (not localCheckpoint) keeps isotonic_fit lazy under AQE:
    constructing the fit runs NO job; release() drops its cache."""
    from shaha_spark.operators.classifier import isotonic_fit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        (F.length("text") % 2 == 0).alias("lab"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(1000)) / 1000.0).alias("p"),
    )
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    fit = isotonic_fit(scored, "lab", "p", bins=8)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "isotonic_fit ran work at plan-build"
    assert fit.count() <= 8
    assert release(fit) == 1


def test_migrated_operators_register_their_pins(spark, sf_dir):
    """r10 persist migration: every operator that pins a
    multi-consumer intermediate registers it on its result, so one
    release(result) drops ALL of its cache entries (CacheManager
    empty afterwards)."""
    from shaha_spark.operators.profile import chi_square, ks_2samp
    from shaha_spark.operators.terms import unigram_logprob
    from shaha_spark.pipeline.curate import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    jcm = spark._jsparkSession.sharedState().cacheManager()

    cases = [
        (
            "unigram_logprob",
            lambda: unigram_logprob(docs),
            1,
        ),
        (
            "chi_square",
            lambda: chi_square(
                ev.select((F.col("user_id") % 3).alias("a"), "event_type"),
                "a",
                "event_type",
            ),
            1,
        ),
        (
            "ks_2samp",
            lambda: ks_2samp(
                ev.select((F.col("user_id") % 2).alias("g"), "value"),
                "g",
                "value",
                0,
                1,
            ),
            1,
        ),
        (
            "curate",
            lambda: curate_corpus(docs),
            3,  # line_dedup + gopher + exact barriers (defaults)
        ),
    ]
    for name, build, n_pins in cases:
        spark.catalog.clearCache()
        result = build()
        result.count()
        dropped = release(result)
        assert dropped == n_pins, (name, dropped, n_pins)
        assert jcm.isEmpty(), f"{name}: cache entries left after release"
