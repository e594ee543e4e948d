"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 (plus
the training-data extension operators) to a (spark, sf_dir) → DataFrame
callable; ``oracle_sql()`` provides the DuckDB-equivalent ANSI SQL.
Both sides are generated from the same constants
(shaha_spark/operators/constants.py), and all floating-point outputs
are reproducible across engines: exact decimal accumulation cast to
double for sums, sequential-fold / single-division double arithmetic
(deliberately UNrounded — round() itself diverges at half-ulp
boundaries of small-integer ratios) for ratios and scores, and
round(…, 6) only for cosine similarity, where engine-internal FMA
accumulation differs in the last ulp but real-valued cosines never sit
on decimal half-boundaries.

SURVEY §2 coverage map (query name → inventory items):
    wordlist_scan            S1/F1 (scan + non-empty filter)
    word_dedup               A1 (word-level distinct)
    build_sha256             H3 + flagship build projection
    build_multi_algo         H1/H3 + H17 (multi-algo fanout) + J2
    build_hash256            H9 (no SQL oracle: DuckDB lacks sha256(BLOB);
                             the kernel is verified via build_all_algos)
    build_all_algos          H1-H9: all nine digests vs DuckDB-native
                             md5/sha256 + literal known-answer table
    query_point_lookup       F2 full-digest point lookup (+P1 semantics)
    query_prefix             F2 prefix lookup
    query_algo_filter        F3 algorithm equality
    query_topk_by_hash       O1/O2 (sort by hash + limit)
    append_merge             J1 (full-outer merge, sources union)
    db_stats                 A3/A5 (stats aggregate)
    build_summary            A2/A6 (counts + dry-run estimate)
    tpch_q1/q3/q5/q6/q18     engine-level agg/join/subquery capability
                             (q18 = HAVING-subquery semi-join shape)
    part_filter              LIKE + range predicate pushdown
    events_salted_agg        skew-resistant two-phase salted aggregation
    events_hourly            time-bucketed aggregation
    events_sessionize        stateful window (gap sessionization)
    events_json_extract      semi-structured projection
    dedup_exact              extension: exact dedup
    dedup_minhash_sigs       extension: MinHash signatures
    dedup_minhash_pairs      extension: LSH band candidate pairs
    dedup_ngram_jaccard      extension: n-gram Jaccard verification
    dedup_simhash            extension: SimHash fingerprints
    similarity_topk          extension: brute-force cosine top-k
    similarity_ivf           extension: IVF ANN (windowed-argmax oracle)
    kmeans_centroids         extension: distributed Lloyd k-means
                             (per-iteration chained-CTE oracle)
    similarity_ivf_kmeans    extension: end-to-end ANN (k-means training
                             feeding IVF probing, one composed oracle)
    embedding_near_dup       extension: cosine near-dup pairs
    text_token_count         extension: token counting
    text_quality             extension: quality scoring
    text_langid              extension: language ID
    text_fingerprint         extension: order-sensitive fingerprint
    multimodal_meta          extension: binary decode plumbing (mapInPandas)
    multimodal_frame_count   extension: frame-sampling fan-out shape
    dedup_minhash_survivors  extension: end-to-end near-dup removal
    dedup_minhash_cc         extension: transitive (connected-components)
                             near-dup removal (recursive-CTE oracle)
    dedup_simhash_pairs      extension: Hamming near-dup pairs
    words_intersect/except   set operations (§2.8)
    profile_lineitem         extension: deterministic column profiling
    profile_table            extension: whole-table profile, one pass
    sample_documents         extension: deterministic hash sampling
    split_documents          extension: disjoint train/eval/test split
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shaha_spark.operators.constants import (
    FINGERPRINT_K,
    LANG_STOPWORDS,
    LSH_BANDS,
    LSH_ROWS_PER_BAND,
    MERSENNE_P,
    MINHASH_PERMS,
    QUALITY_STOPWORDS,
)
from shaha_spark.util import normalize_event_ts

# deterministic full-digest constant for the point-lookup query:
# sha256("the") — "the" is guaranteed by both engines to hash identically;
# if absent from the corpus both sides return the same empty set.
POINT_SHA256 = "b9776d7ddf459c9ad5b0e1d6ac61e27befb5e99fd62446677600d7cacef544d0"

SESSION_GAP_US = 1_800_000_000  # 30 min in microseconds
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


_PKG_SHIPPED: set[int] = set()


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship the shaha_spark package to this session's Python workers.

    Queries that pickle Python functions (mapInPandas / pandas UDFs)
    reference the package by module path; the driver's session may not
    have it importable on workers. addPyFile distributes a zip that
    lands on every executor's sys.path — the same mechanism used for a
    real cluster deploy.
    """
    key = id(spark)
    if key in _PKG_SHIPPED:
        return
    import shutil
    import tempfile

    root = os.path.dirname(os.path.abspath(__file__))
    tmp = tempfile.mkdtemp(prefix="shaha_pkg_")
    zpath = shutil.make_archive(
        os.path.join(tmp, "shaha_spark_pkg"), "zip", root_dir=root, base_dir="shaha_spark"
    )
    spark.sparkContext.addPyFile(zpath)
    _PKG_SHIPPED.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _utc(spark: SparkSession) -> None:
    """Timestamp queries assume UTC rendering; the driver's session may
    not be configured that way, so pin it at query time."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a normalized microsecond-epoch column `tus`.

    The fixture's `ts` encoding has varied across regenerations —
    TIMESTAMP(NANOS) (readable only as raw int64 under the legacy
    nanosAsLong conf) or plain micros TIMESTAMP_NTZ — so normalization
    is delegated to :func:`shaha_spark.util.normalize_event_ts`; with
    the session pinned to UTC, `unix_micros(ts)` then agrees exactly
    with DuckDB's `epoch_us(ts)` on the same parquet."""
    _utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_event_ts(_t(spark, sf_dir, "events"))
    return ev.withColumn("tus", F.unix_micros(F.col("ts")))


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenized documents: [word, source, doc_id], empties dropped."""
    return (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(F.split("text", " ")).alias("word"), "source", "doc_id"
        )
        .filter(F.col("word") != "")
    )


def _dwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _words(spark, sf_dir).select("word").distinct()


def _hex(col: str = "hash") -> F.Column:
    return F.lower(F.hex(F.col(col))).alias("hash_hex")


def _dec(col: str, prec: str = "decimal(12,2)") -> F.Column:
    return F.col(col).cast(prec)


# --------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------

def q_wordlist_scan(spark, sf_dir):
    return _words(spark, sf_dir).select("word", "source")


def q_word_dedup(spark, sf_dir):
    return _dwords(spark, sf_dir)


def q_build_sha256(spark, sf_dir):
    return _dwords(spark, sf_dir).select(
        F.sha2("word", 256).alias("hash_hex"),
        F.col("word").alias("preimage"),
        F.lit("sha256").alias("algorithm"),
    )


def _multi_algo(spark, sf_dir):
    from shaha_spark.pipeline.build import dedup_records, hash_fanout

    records = hash_fanout(_dwords(spark, sf_dir), ["md5", "sha256"])
    return dedup_records(records).select(
        _hex(), F.col("preimage"), F.col("algorithm")
    )


def q_build_multi_algo(spark, sf_dir):
    return _multi_algo(spark, sf_dir)


def q_build_hash256(spark, sf_dir):
    from shaha_spark.pipeline.build import hash_fanout

    return hash_fanout(_dwords(spark, sf_dir), ["hash256"]).select(
        _hex(), F.col("preimage"), F.col("algorithm")
    )


def q_build_all_algos(spark, sf_dir):
    """All nine digest algorithms over the corpus vocabulary (∪ the
    reference's canonical "hello"), restricted to the words covered by
    the known-answer table so the DuckDB side can assert literal
    expected digests for the algorithms DuckDB cannot compute natively
    (sha1/sha512/keccak256/ripemd160/blake3/hash160/hash256)."""
    from shaha_spark.functions.digest_vectors import VECTOR_DIGESTS
    from shaha_spark.functions.hashers import available_algorithms
    from shaha_spark.pipeline.build import hash_fanout

    _ensure_pkg(spark)  # keccak/blake3/ripemd160 are pandas UDFs
    dw = (
        _dwords(spark, sf_dir)
        .union(spark.createDataFrame([("hello",)], "word string"))
        .distinct()
        .filter(F.col("word").isin(sorted(VECTOR_DIGESTS)))
    )
    return hash_fanout(dw, available_algorithms()).select(
        _hex(), "preimage", "algorithm"
    )


def q_point_lookup(spark, sf_dir):
    return q_build_sha256(spark, sf_dir).filter(
        F.col("hash_hex") == POINT_SHA256
    )


def q_prefix(spark, sf_dir):
    # "b9" matches sha256("the") = b977... — a prefix chosen to return
    # rows, mirroring the reference's prefix round-trip which queries a
    # prefix of a digest known to exist (ref tests/integration.rs:147-151).
    return q_build_sha256(spark, sf_dir).filter(
        F.col("hash_hex").startswith("b9")
    ).select("hash_hex", "preimage")


def q_algo_filter(spark, sf_dir):
    return _multi_algo(spark, sf_dir).filter(F.col("algorithm") == "md5")


def q_topk_by_hash(spark, sf_dir):
    return _multi_algo(spark, sf_dir).orderBy("hash_hex").limit(100)


def q_append_merge(spark, sf_dir):
    from shaha_spark.pipeline.append import append_merge
    from shaha_spark.pipeline.build import hash_fanout

    words = _words(spark, sf_dir)
    even = words.filter(F.col("doc_id") % 2 == 0).select("word").distinct()
    odd = words.filter(F.col("doc_id") % 2 == 1).select("word").distinct()
    existing = hash_fanout(even, ["sha256"], "even")
    new = hash_fanout(odd, ["sha256"], "odd")
    return append_merge(existing, new).select(
        _hex(),
        F.col("preimage"),
        F.col("algorithm"),
        F.array_join("sources", ",").alias("sources_str"),
    )


def q_db_stats(spark, sf_dir):
    return _multi_algo(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("total_records"),
        F.count_distinct(F.col("preimage")).alias("n_preimages"),
        F.array_join(F.sort_array(F.collect_set("algorithm")), ",").alias(
            "algorithms_str"
        ),
    )


def q_build_summary(spark, sf_dir):
    words = _words(spark, sf_dir)
    return words.agg(
        F.count(F.lit(1)).alias("total_words"),
        F.count_distinct(F.col("word")).alias("unique_words"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("word"))).alias("duplicates"),
        (F.count_distinct(F.col("word")) * 2).alias("records_to_generate"),
    )


def q_tpch_q1(spark, sf_dir):
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(4,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    charge = disc_price * (one + _dec("l_tax", "decimal(4,2)"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    _utc(spark)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(4,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_events_hourly(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(
                F.date_trunc("hour", F.timestamp_micros(F.col("tus"))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", "decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def q_events_sessionize(spark, sf_dir):
    ev = _events(spark, sf_dir).select("user_id", "event_id", "tus")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tus").alias("session_start_us"),
        F.max("tus").alias("session_end_us"),
    )


def q_events_json(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


# attribution window for the interval join: 30 minutes in microseconds
ATTRIB_WINDOW_US = 30 * 60 * 1_000_000


def q_events_asof(spark, sf_dir):
    """Attribute each purchase to the user's most recent signup at or
    before it — one union + one window, zero joins (joins.asof_join)."""
    from shaha_spark.operators.joins import asof_join, dedup_keep_latest

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tus"
    )
    signups = dedup_keep_latest(
        ev.filter(F.col("event_type") == "signup").select(
            "user_id", "tus", "event_id", "value"
        ),
        ["user_id", "tus"],
        "event_id",
    )
    return asof_join(
        purchases, signups, "user_id", "tus", ["event_id", "value"]
    )


def q_events_interval(spark, sf_dir):
    """Purchases landing inside each signup's 30-minute attribution
    window, via the bucketed equi-join (joins.interval_join) — never a
    quadratic range join."""
    from shaha_spark.operators.joins import interval_join

    ev = _events(spark, sf_dir)
    intervals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("tus").alias("start_us"),
        (F.col("tus") + F.lit(ATTRIB_WINDOW_US)).alias("end_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "tus", "value"
    )
    joined = interval_join(
        purchases, intervals, "user_id", "tus", max_len=ATTRIB_WINDOW_US
    )
    return joined.groupBy("interval_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        F.sum(_dec("value", "decimal(18,2)")).cast("double").alias("sum_value"),
    )


def q_events_rollup(spark, sf_dir):
    """Time-hierarchy rollup (hypertable continuous-aggregate shape):
    (day, type) → (day) → grand total in one Expand + hash aggregate;
    NULL grouping levels labelled 'ALL' for cross-engine comparability."""
    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format(F.timestamp_micros(F.col("tus")), "yyyy-MM-dd")
    )
    return (
        ev.rollup("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", "decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def q_events_funnel(spark, sf_dir):
    """Sessionized funnel: per 30-min-gap session, how far the
    signup → click → purchase sequence progressed (in session order,
    at-or-after semantics), counted by furthest stage. Chained running
    windows over one lineage — no per-stage self-joins."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "tus", "event_type")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    ws = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seen_signup = F.max(
        F.when(F.col("event_type") == "signup", 1).otherwise(0)
    ).over(ws)
    click_after = F.when(
        (F.col("event_type") == "click") & (seen_signup == 1), 1
    ).otherwise(0)
    staged = sess.withColumn("s1", seen_signup).withColumn(
        "s2", F.max(click_after).over(ws)
    )
    purchase_after = F.when(
        (F.col("event_type") == "purchase") & (F.col("s2") == 1), 1
    ).otherwise(0)
    staged = staged.withColumn("s3", F.max(purchase_after).over(ws))
    per_session = staged.groupBy("user_id", "session_id").agg(
        (F.max("s1") + F.max("s2") + F.max("s3")).alias("funnel_stage")
    )
    return per_session.groupBy("funnel_stage").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


def q_docs_pagerank(spark, sf_dir):
    """Fixed-point PageRank over the LSH near-dup candidate graph —
    document centrality for cluster-representative selection
    (operators.graph.pagerank_fixed; integer-exact, so the iterative
    result value-hashes against the chained-CTE oracle)."""
    from shaha_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from shaha_spark.operators.graph import pagerank_fixed

    sigs = minhash_signatures(_t(spark, sf_dir, "documents"))
    return pagerank_fixed(lsh_candidate_pairs(sigs), iterations=3)


def q_events_transitions(spark, sf_dir):
    """First-order transition counts between consecutive event types
    per user (lead window) — the Markov-matrix input for behavior
    modeling; terminal events pair with 'END'."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "tus", "event_type")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    nxt = F.coalesce(F.lead("event_type").over(w), F.lit("END"))
    return (
        ev.withColumn("next_type", nxt)
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_events_histogram(spark, sf_dir):
    """Equi-width 12-bin histogram of event values — fixed-width
    shuffle profiling (operators.profile.histogram)."""
    from shaha_spark.operators.profile import histogram

    return histogram(_events(spark, sf_dir).select("value"), "value", bins=12)


def q_docs_quality_filter(spark, sf_dir):
    """Curation stage: keep documents at or above their source's p25
    quality — per-stratum quantile filtering in one lineage
    (operators.profile.group_quantile_filter over quality_score)."""
    from shaha_spark.operators.profile import group_quantile_filter
    from shaha_spark.operators.textops import quality_score

    docs = _t(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return group_quantile_filter(q, "source", "quality", 0.25).select(
        "doc_id", "source", "quality", "q_threshold"
    )


def q_text_normalize(spark, sf_dir):
    """Canonical cleanup (lowercase / charset strip / whitespace
    collapse) — the normalization stage ahead of tokenizers and dedup
    keys (operators.textops.normalize_text)."""
    from shaha_spark.operators.textops import normalize_text

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit("  X!? "), F.col("source"))
    )
    return normalize_text(docs)


def q_words_except_all(spark, sf_dir):
    """Multiset difference (EXCEPT ALL): word occurrences in even docs
    minus, per-copy, occurrences in odd docs — bag semantics the plain
    EXCEPT cannot express."""
    words = _words(spark, sf_dir)
    even = words.filter(F.col("doc_id") % 2 == 0).select("word")
    odd = words.filter(F.col("doc_id") % 2 == 1).select("word")
    return even.exceptAll(odd)


def q_events_zorder(spark, sf_dir):
    """32-bit Morton code over (user_id, event time) — the clustering
    key that bounds every file's bounding box in BOTH dimensions
    (operators.layout.zorder_value); integer-exact, engine-portable."""
    from shaha_spark.operators.layout import zorder_value

    ev = _events(spark, sf_dir).select("event_id", "user_id", "tus")
    return zorder_value(ev, "user_id", "tus").select("event_id", "zval")


def q_profile_correlation(spark, sf_dir):
    """Deterministic Pearson r between quantity and price — decimal-
    exact sums, fixed double op sequence (operators.profile.pearson_corr;
    engine corr() would drift with partitioning)."""
    from shaha_spark.operators.profile import pearson_corr

    return pearson_corr(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


#: data-quality rules for lineitem — Spark predicate and SQL twin are
#: generated from this single table; quantity_under_30 is DELIBERATELY
#: failing so the report exercises both outcomes
DQ_LINEITEM_RULES_SQL = {
    "quantity_positive": "l_quantity > 0",
    "quantity_under_30": "l_quantity <= 30",
    "discount_in_range": "l_discount >= 0 AND l_discount <= 1",
    "shipdate_not_null": "l_shipdate IS NOT NULL",
    "price_positive": "l_extendedprice > 0",
    "returnflag_domain": "l_returnflag IN ('A', 'N', 'R')",
}


def q_dq_lineitem(spark, sf_dir):
    """Data-quality gate: six expectations over lineitem in ONE
    aggregation pass (operators.checks.check_rules)."""
    from shaha_spark.operators.checks import check_rules

    rules = {
        name: F.expr(sql_pred)
        for name, sql_pred in DQ_LINEITEM_RULES_SQL.items()
    }
    return check_rules(_t(spark, sf_dir, "lineitem"), rules)


#: weighted-sampling normalizer: documents cap out near this length
WEIGHTED_MAX_CHARS = 200.0


def q_sample_weighted(spark, sf_dir):
    """Length-proportional document sampling (importance sampling for
    training mixes): keep probability = n_chars / 200, decided by the
    same cross-engine hash as the uniform sampler."""
    from shaha_spark.operators.sampling import weighted_hash_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_hash_sample(
        docs, "n_chars", WEIGHTED_MAX_CHARS, "doc_id", salt="wr2"
    ).select("doc_id", "n_chars")


def q_tpch_q4(spark, sf_dir):
    """EXISTS → left-semi join: orders (one quarter) with at least one
    late-shipped lineitem, counted per priority. The semi-join never
    multiplies rows, so no post-join dedup is needed."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_tpch_q13(spark, sf_dir):
    """Outer-join distribution: customers by how many non-urgent orders
    they placed, zero included — the join predicate lives IN the outer
    join (a WHERE would silently drop the zero-order customers)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_part_never_shipped(spark, sf_dir):
    """NOT EXISTS → left-anti join: brands' counts of parts with no
    bulk shipment (quantity >= 45) in the dataset's last window."""
    _utc(spark)
    part = _t(spark, sf_dir, "part")
    shipped = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
        & (F.col("l_quantity") >= 45)
    )
    never = part.join(
        shipped, F.col("p_partkey") == F.col("l_partkey"), "left_anti"
    )
    return never.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts"))


#: the closed event-type vocabulary (pivot needs an explicit list to
#: stay a single pass — an unlisted pivot triggers a distinct-scan job)
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf_dir):
    """Long → wide: per-day event counts, one column per type. The
    explicit value list keeps pivot single-pass and the output schema
    static; absent combinations surface as 0, not null."""
    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format(F.timestamp_micros(F.col("tus")), "yyyy-MM-dd")
    )
    wide = (
        ev.groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day", *[F.coalesce(t, F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


def q_events_unpivot(spark, sf_dir):
    """Wide → long (melt): the pivoted table stacked back to
    (day, event_type, n_events) — zeros kept, so pivot∘unpivot is the
    dense day×type grid."""
    wide = q_events_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["day"],
        values=EVENT_TYPES,
        variableColumnName="event_type",
        valueColumnName="n_events",
    )


def q_events_percentiles(spark, sf_dir):
    """Exact p50/p95 of value per event type, explicit-interpolation
    quantiles (operators.profile.group_quantiles)."""
    from shaha_spark.operators.profile import group_quantiles

    return group_quantiles(
        _events(spark, sf_dir), "event_type", "value", [0.5, 0.95]
    )


def q_orders_topk_per_cust(spark, sf_dir):
    """Grouped top-k: each customer's 3 highest-value orders by ranked
    window with a deterministic orderkey tiebreak."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup ingest: odd-id docs arrive as the new batch
    and are deduped against the persisted signatures of the even-id
    corpus (operators.dedup.incremental_minhash_dedup) — surviving
    new-doc ids."""
    from shaha_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new_batch = docs.filter(F.col("doc_id") % 2 == 1)
    return incremental_minhash_dedup(
        new_batch, minhash_signatures(existing), threshold=0.7
    )


#: rolling feature window: 7 days in microseconds
ROLLING_WINDOW_US = 7 * 24 * 3600 * 1_000_000


def q_events_rolling(spark, sf_dir):
    """Per-user trailing-7-day rolling features (count + exact decimal
    sum) via a RANGE window frame — the standard feature-backfill
    shape: one shuffle on user_id, no self-join."""
    ev = _events(spark, sf_dir).select("event_id", "user_id", "tus", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-ROLLING_WINDOW_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "tus",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum(_dec("value", "decimal(18,2)")).over(w).cast("double").alias("sum_7d"),
    )


def q_events_hll(spark, sf_dir):
    """Deterministic HyperLogLog distinct estimate (p=6) next to the
    exact count — the sketch is register-exact across engines
    (operators.sketch.hll_distinct)."""
    from shaha_spark.operators.sketch import hll_distinct

    ev = _events(spark, sf_dir)
    hll = hll_distinct(ev, "event_id", p=6)
    exact = ev.agg(F.countDistinct("event_id").alias("exact_distinct"))
    return hll.crossJoin(F.broadcast(exact))


#: CMS probe words for the sketch driver query (fixed literals so the
#: Spark and oracle sides are generated from the same list)
CMS_PROBE_WORDS = ["the", "a", "and", "data", "of", "zzz-absent"]


def q_sketch_cms(spark, sf_dir):
    """Count-Min frequency estimates for a fixed probe-word list over
    the document token stream (operators.sketch.cms_frequencies)."""
    from shaha_spark.functions.text import tokens
    from shaha_spark.operators.sketch import cms_frequencies

    words = _t(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("w")
    )
    return cms_frequencies(words, "w", CMS_PROBE_WORDS)


def q_dedup_bloom_screen(spark, sf_dir):
    """Bloom-filter dedup admission: which documents are possibly
    already in the corpus (doc_id % 3 == 0 slice)? No false negatives;
    the bitmap is KB-sized regardless of corpus size
    (operators.sketch.bloom_membership)."""
    from shaha_spark.operators.sketch import bloom_membership

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 == 0).select("text")
    probes = docs.select(F.col("doc_id"), F.col("text"))
    return bloom_membership(corpus, probes, "text", "doc_id").select(
        "doc_id", "maybe_in_corpus"
    )


def q_events_equidepth(spark, sf_dir):
    """Per-event-type equi-depth histogram (8 equal-count buckets over
    value, event_id tiebreak) — operators.profile.equi_depth_histogram."""
    from shaha_spark.operators.profile import equi_depth_histogram

    return equi_depth_histogram(
        _events(spark, sf_dir), "event_type", "value", "event_id", buckets=8
    )


def q_tpch_q7(spark, sf_dir):
    """Volume-shipping shape (TPC-H Q7): bidirectional nation-pair
    revenue by ship year. Nation and supplier broadcast (small dims);
    the orders-customer and lineitem-orders joins shuffle on their
    keys. Decimal-exact revenue."""
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q_tpch_q8(spark, sf_dir):
    """National-market-share shape (TPC-H Q8): NATION_3's share of
    EUROPE-customer PROMO-part revenue by order year — two conditional
    decimal sums, one final division."""
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    sn = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = nat.join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
        )
    )


def q_tpch_q9(spark, sf_dir):
    """Product-profit shape (TPC-H Q9, reduced schema: no partsupp →
    profit is discounted revenue) for parts named like '%gear%',
    by supplier nation and order year."""
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev).cast("double").alias("sum_profit"))
    )


def q_events_dim_salted_join(spark, sf_dir):
    """Skew-proof fact-dim join (operators.skew.salted_broadcast_join):
    events join customer on a salted composite key, aggregated per
    market segment. Salt-invariant — the oracle is the plain join."""
    from shaha_spark.operators.skew import salted_broadcast_join

    ev = _events(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer")
    joined = salted_broadcast_join(ev, cust, "user_id", "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value", "decimal(18,2)")).cast("double").alias("sum_value"),
    )


def q_users_hll_by_type(spark, sf_dir):
    """Per-event-type HLL distinct-user estimates
    (operators.sketch.hll_group_distinct)."""
    from shaha_spark.operators.sketch import hll_group_distinct

    return hll_group_distinct(_events(spark, sf_dir), "event_type", "user_id", p=6)


def q_docs_balanced_sample(spark, sf_dir):
    """Class-balanced corpus downsample: at most 60 documents per
    language by deterministic hash rank
    (operators.sampling.balanced_sample)."""
    from shaha_spark.operators.sampling import balanced_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return balanced_sample(docs, "lang", 60, "doc_id")


def q_events_winsorized(spark, sf_dir):
    """Per-event-type 5/95 quantile clipping
    (operators.profile.winsorize)."""
    from shaha_spark.operators.profile import winsorize

    return winsorize(
        _events(spark, sf_dir), "event_type", "value", "event_id", 0.05, 0.95
    )


def q_docs_chunked(spark, sf_dir):
    """Sliding 32-token windows with 8-token overlap over every
    document (operators.chunking.chunk_documents)."""
    from shaha_spark.operators.chunking import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), chunk=32, overlap=8)


def q_docs_packed(spark, sf_dir):
    """Deterministic concat-packing of documents into 256-token
    training bins via a distributed running token count
    (operators.chunking.pack_sequences)."""
    from shaha_spark.operators.chunking import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), capacity=256)


#: decontamination n-gram width (the standard exact-overlap guard)
DECONTAM_NGRAM = 8


def q_term_stats(spark, sf_dir):
    """tf / df / ratio-idf weight per (doc, term) — vocabulary-curation
    statistics (operators.terms.term_stats)."""
    from shaha_spark.operators.terms import term_stats

    return term_stats(_t(spark, sf_dir, "documents"))


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: train docs (r2-salted hash split)
    sharing any 8-gram with the eval split, via a distinct-gram join
    (operators.terms.decontaminate)."""
    from shaha_spark.operators.sampling import hash_split
    from shaha_spark.operators.terms import decontaminate

    split = hash_split(
        _t(spark, sf_dir, "documents"), SPLIT_WEIGHTS, "doc_id", salt="r2"
    )
    out = decontaminate(
        split.filter(F.col("split") == "train"),
        split.filter(F.col("split") == "eval"),
        n=DECONTAM_NGRAM,
    )
    return out.select(
        "doc_id", "n_shared_grams", F.col("contaminated").cast("int").alias("contaminated")
    )


def q_tpch_q5(spark, sf_dir):
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


def q_tpch_q6(spark, sf_dir):
    """Forecast-revenue shape: tight range + between predicates, all
    pushdown-eligible, single partial-agg scan."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    revenue = _dec("l_extendedprice") * _dec("l_discount", "decimal(4,2)")
    return li.agg(F.sum(revenue).cast("double").alias("revenue"))


def q_tpch_q18(spark, sf_dir):
    """Large-volume-order shape: HAVING subquery (orders whose total
    quantity exceeds a threshold) semi-joined back into a three-table
    rollup — the IN-subquery semantics the reference's SQL surface
    implies, expressed as aggregate → semi-join."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q"))
        .where(F.col("__q") > 250)
        .select("l_orderkey")
    )
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


def q_tpch_q10(spark, sf_dir):
    """Returned-item revenue shape (TPC-H Q10 on the reduced schema):
    fact-to-fact join filtered on both sides, four-table star, top-20
    by a computed aggregate with a deterministic key tiebreak.  At
    scale the orders/lineitem join shuffles on orderkey while nation
    broadcasts; the limit is driver-side only after a global sort of
    ~|customers| aggregated rows."""
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q14(spark, sf_dir):
    """Promotion-effect shape (TPC-H Q14): conditional aggregation
    ratio — two decimal-exact sums in one pass over the join, a single
    final double division (deterministic: one IEEE op on exact
    operands).  The part side broadcasts; one scan, no second pass for
    the denominator."""
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)")))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias("promo_pct"),
    )


def q_tpch_q15(spark, sf_dir):
    """Top-supplier shape (TPC-H Q15): aggregate-then-scalar-max
    subquery.  The max is a one-row aggregate broadcast back onto the
    per-supplier revenue table (crossJoin of a single row — no
    shuffle), and the equality compares the exact DECIMAL revenue, so
    ties and the max itself are bit-deterministic."""
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(F.sum(rev).alias("__rev"))
    best = revenue.agg(F.max("__rev").alias("__best"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("__rev") == F.col("__best"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
    )


def q_tpch_q17(spark, sf_dir):
    """Small-quantity-order shape (TPC-H Q17): correlated AVG scalar
    subquery per part, rewritten as a window over the brand-filtered
    lineitems — one scan, no diamond self-join (the term_stats
    lesson).  The threshold ``l_quantity < 0.2 * avg(l_quantity)`` is
    rearranged to ``5 * qty * cnt < sum_qty`` so the comparison stays
    in exact DECIMAL arithmetic (no division, no float boundary
    flips); the single final division by 7.0 is one IEEE op."""
    from pyspark.sql import Window

    _utc(spark)
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "inner",
    )
    w = Window.partitionBy("l_partkey")
    qty = _dec("l_quantity")
    enriched = li.select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.sum(qty).over(w).alias("__sum_qty"),
        F.count(F.lit(1)).over(w).alias("__cnt"),
    )
    small = enriched.filter(
        qty * F.lit(5) * F.col("__cnt") < F.col("__sum_qty")
    )
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


def q_tpch_q19(spark, sf_dir):
    """Disjunctive-predicate shape (TPC-H Q19): OR-of-ANDs spanning
    both join sides.  Catalyst extracts the common ``p_brand IN``
    /quantity envelope as pushable conjuncts (PushedFilters on both
    scans) and evaluates the residual OR post-join; part broadcasts."""
    _utc(spark)
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_tpch_q22(spark, sf_dir):
    """Dormant-customer shape (TPC-H Q22 on the reduced schema):
    uncorrelated scalar AVG subquery (sum-decimal / count — both exact,
    one IEEE division) feeding a filter, then NOT EXISTS against
    urgent orders as a broadcast-able anti-join, aggregated per
    nation.  The anti-join's right side is pre-filtered to urgent
    orders only, so at 100 TB it ships a fraction of the orders
    table."""
    _utc(spark)
    cust = _t(spark, sf_dir, "customer")
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("__thr")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal").cast("double") > F.col("__thr"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


def q_text_vocab(spark, sf_dir):
    """Top-10 corpus vocabulary (count desc, term asc — deterministic
    at the cut)."""
    from shaha_spark.operators.terms import top_vocab

    return top_vocab(_t(spark, sf_dir, "documents"), 10)


def q_text_oov(spark, sf_dir):
    """Per-doc out-of-vocabulary rate against the broadcast top-10
    vocab — tokenizer-coverage QA for training corpora."""
    from shaha_spark.operators.terms import oov_rate, top_vocab

    docs = _t(spark, sf_dir, "documents")
    return oov_rate(docs, top_vocab(docs, 10))


def q_docs_repetition(spark, sf_dir):
    """Gopher-style repeated-3-gram ratio per document."""
    from shaha_spark.operators.terms import ngram_repetition

    return ngram_repetition(_t(spark, sf_dir, "documents"), 3)


def q_docs_cosine_pairs(spark, sf_dir):
    """Sparse tf-idf cosine near-dup pairs via the inverted-index
    postings bucket join (integer-quantized idf keeps every sum exact,
    so the cosine is bit-deterministic)."""
    from shaha_spark.operators.terms import tf_cosine_pairs

    return tf_cosine_pairs(_t(spark, sf_dir, "documents"), threshold=0.9)


def q_events_redact(spark, sf_dir):
    """Digit-run redaction over the event props payload — the PII
    scrubbing plumbing (dialect-portable character-class regex)."""
    from shaha_spark.operators.textops import redact_numbers

    return redact_numbers(_events(spark, sf_dir), "props", id_col="event_id")


def q_words_lev_pairs(spark, sf_dir):
    """Vocabulary typo/variant pairs within edit distance 2 —
    length-banded blocked join, never O(n²)."""
    from shaha_spark.operators.dedup import levenshtein_pairs

    return levenshtein_pairs(_dwords(spark, sf_dir), "word", max_dist=2)


def q_events_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-seen day,
    activity counted per (cohort, day-offset) cell. Day indices are
    integer epoch-microsecond division — exact in both engines. The
    cohort attaches as a window over the user partition (single
    lineage, one shuffle on user_id) rather than a groupBy fork."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id", F.expr("tus DIV 86400000000").alias("day")
    )
    d = ev.withColumn("cohort_day", F.min("day").over(Window.partitionBy("user_id")))
    return (
        d.select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q_events_outliers(spark, sf_dir):
    """Per-event-type z-score anomaly screen (|z| > 3) with
    decimal-exact moments and a NaN-safe degenerate-group guard."""
    from shaha_spark.operators.profile import zscore_outliers

    ev = _events(spark, sf_dir)
    return zscore_outliers(ev, "value", ["event_type"], "event_id", z=3.0)


def q_dedup_minhash_eval(spark, sf_dir):
    """LSH candidate quality vs exact-Jaccard ground truth: one row of
    candidate/truth/hit counts with precision and recall."""
    from shaha_spark.operators.dedup import minhash_eval

    return minhash_eval(_t(spark, sf_dir, "documents"), jaccard_threshold=0.5)


def q_part_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%small%") & (F.col("p_size") >= 10))
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
    )


def q_events_salted_agg(spark, sf_dir):
    from shaha_spark.operators.skew import salted_count_sum

    ev = _events(spark, sf_dir)
    return salted_count_sum(ev, ["event_type"], "value")


def q_profile_lineitem(spark, sf_dir):
    from shaha_spark.operators.profile import numeric_profile

    return numeric_profile(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

SPLIT_WEIGHTS = {"eval": 0.05, "test": 0.05, "train": 0.9}


def q_sample_documents(spark, sf_dir):
    """Deterministic 10% document sample (hash-membership, not RNG —
    reproducible across engines, partitionings, and re-runs)."""
    from shaha_spark.operators.sampling import hash_sample

    return hash_sample(
        _t(spark, sf_dir, "documents"), 0.1, "doc_id", salt="r2"
    ).select("doc_id", "source")


def q_split_documents(spark, sf_dir):
    """Disjoint exhaustive train/eval/test assignment from the same
    membership hash; per-split counts as the compact verifiable output."""
    from shaha_spark.operators.sampling import hash_split

    split = hash_split(
        _t(spark, sf_dir, "documents"), SPLIT_WEIGHTS, "doc_id", salt="r2"
    )
    return split.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


def q_profile_table(spark, sf_dir):
    """Whole-table numeric profile: one scan, one aggregation, one row
    per column (single-pass at any table width)."""
    from shaha_spark.operators.profile import table_profile

    return table_profile(_t(spark, sf_dir, "lineitem"), PROFILE_COLS)


def q_words_intersect(spark, sf_dir):
    # set op (§2.8): words appearing in BOTH even- and odd-id documents
    words = _words(spark, sf_dir)
    even = words.filter(F.col("doc_id") % 2 == 0).select("word")
    odd = words.filter(F.col("doc_id") % 2 == 1).select("word")
    return even.intersect(odd)


def q_words_except(spark, sf_dir):
    # set op (§2.8): corpus vocabulary EXCEPT the words of document 0.
    # (Asymmetric by construction — any even/odd doc split covers the
    # full vocabulary on both sides and EXCEPTs to the empty set, which
    # would verify nothing.)
    words = _words(spark, sf_dir)
    all_words = words.select("word")
    doc0 = words.filter(F.col("doc_id") == 0).select("word")
    return all_words.subtract(doc0)  # EXCEPT DISTINCT, matching SQL EXCEPT


def q_dedup_exact(spark, sf_dir):
    from shaha_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id", "content_md5")


def q_minhash_sigs(spark, sf_dir):
    from shaha_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"))


def q_minhash_pairs(spark, sf_dir):
    from shaha_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    return lsh_candidate_pairs(minhash_signatures(_t(spark, sf_dir, "documents")))


def q_ngram_jaccard(spark, sf_dir):
    from shaha_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    return ngram_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.5)


def q_simhash(spark, sf_dir):
    from shaha_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"))


def q_simhash_pairs(spark, sf_dir):
    from shaha_spark.operators.dedup import simhash, simhash_near_dup_pairs

    fps = simhash(_t(spark, sf_dir, "documents"))
    return simhash_near_dup_pairs(fps, max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    )


def q_minhash_survivors(spark, sf_dir):
    from shaha_spark.operators.dedup import minhash_dedup

    return minhash_dedup(_t(spark, sf_dir, "documents"), threshold=0.7)


def q_dedup_minhash_cc(spark, sf_dir):
    from shaha_spark.operators.components import minhash_dedup_cc

    return minhash_dedup_cc(_t(spark, sf_dir, "documents"), threshold=0.7)


def q_similarity_topk(spark, sf_dir):
    from shaha_spark.operators.similarity import brute_force_topk

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = brute_force_topk(embs, queries, k=5)
    return res.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )


def q_similarity_ivf(spark, sf_dir):
    from shaha_spark.operators.similarity import ivf_topk, label_centroids

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = label_centroids(embs)
    res = ivf_topk(embs, queries, cents, k=5, nprobe=3)
    return res.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )


def q_kmeans_centroids(spark, sf_dir):
    """Distributed Lloyd k-means (k=4, 2 iterations) — the iterative
    algorithm fully inside the value-hash gate via a per-iteration
    chained-CTE oracle. Output exploded to scalars: one row per
    (centroid, dimension)."""
    from shaha_spark.operators.kmeans import kmeans_fit

    cents = kmeans_fit(_t(spark, sf_dir, "embeddings"), k=4, iters=2)
    return cents.select(
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        "n_members",
        F.posexplode("centroid").alias("pos", "comp"),
    ).select(
        "centroid_id",
        "n_members",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("comp").cast("double").alias("comp"),
    )


def q_similarity_ivf_kmeans(spark, sf_dir):
    """End-to-end ANN: k-means training feeds IVF probing — the full
    train-then-search pipeline inside one oracle comparison."""
    from shaha_spark.operators.kmeans import kmeans_fit
    from shaha_spark.operators.similarity import ivf_topk

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_fit(embs, k=4, iters=2)
    res = ivf_topk(embs, queries, cents, k=5, nprobe=2)
    return res.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )


def q_embedding_near_dup(spark, sf_dir):
    from shaha_spark.operators.dedup import embedding_near_dup_pairs

    # 0.4 is calibrated to the synthetic fixture, whose max intra-label
    # cosine is ~0.45-0.47 (random unit-ish vectors, no planted dups);
    # a production near-dup threshold would be ~0.95. Chosen so the
    # oracle comparison exercises real pairs instead of the empty set.
    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.4
    )


def q_text_token_count(spark, sf_dir):
    from shaha_spark.operators.textops import token_count

    return token_count(_t(spark, sf_dir, "documents"))


def q_text_quality(spark, sf_dir):
    from shaha_spark.operators.textops import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def q_text_langid(spark, sf_dir):
    from shaha_spark.operators.textops import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def q_text_fingerprint(spark, sf_dir):
    from shaha_spark.operators.textops import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"))


def q_multimodal_meta(spark, sf_dir):
    from shaha_spark.operators.multimodal import decode_metadata, media_from_documents

    _ensure_pkg(spark)
    return decode_metadata(media_from_documents(_t(spark, sf_dir, "documents")))


def q_multimodal_frame_count(spark, sf_dir):
    from shaha_spark.operators.multimodal import media_from_documents, sample_frames

    _ensure_pkg(spark)
    frames = sample_frames(media_from_documents(_t(spark, sf_dir, "documents")))
    return frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))


def q_tpch_q2(spark, sf_dir):
    """Min-cost-supplier shape (TPC-H Q2, reduced schema: lineitem is
    the part↔supplier bridge): for each 'gear' part, the EUROPE
    supplier quoting the minimum extended price. Correlated scalar
    subquery re-expressed as a per-part min + join-back; all dims
    broadcast."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = _t(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_name", "n_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("p_partkey", "p_name", "s_name", "n_name", _dec("l_extendedprice").alias("price"))
    )
    best = offers.groupBy("p_partkey").agg(F.min("price").alias("min_price"))
    return (
        offers.join(best, "p_partkey")
        .filter(F.col("price") == F.col("min_price"))
        .groupBy("p_partkey", "p_name")
        .agg(
            F.min("s_name").alias("s_name"),
            F.min("min_price").cast("double").alias("min_price"),
        )
    )


def q_tpch_q11(spark, sf_dir):
    """Important-stock shape (TPC-H Q11): per-part shipped value for
    NATION_1 suppliers, kept when above 0.1% of the nation's total — a
    HAVING against a global scalar subquery (computed once, broadcast
    as a one-row literal join, never collected per-group)."""
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    value = _dec("l_extendedprice") * _dec("l_quantity", "decimal(12,2)")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(supp.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(value).alias("part_value"))
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        # part_value > 0.1% of total, kept exact: scale by integer 1000
        # (decimal x decimal fractions change scale differently across
        # engines; integer scaling stays within exact decimal arithmetic)
        .filter(
            F.col("part_value") * F.lit(1000).cast("decimal(4,0)")
            > F.col("total_value")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
    )


def q_tpch_q12(spark, sf_dir):
    """Shipping-priority-audit shape (TPC-H Q12, reduced schema:
    return-flag classes stand in for ship modes; lateness is shipdate
    > orderdate + 60 days): per class, count of high- vs low-priority
    orders among late-shipped lines — join + conditional aggregation."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


def q_tpch_q16(spark, sf_dir):
    """Supplier-diversity shape (TPC-H Q16): distinct suppliers per
    (brand, type, size) for non-PROMO, non-Brand#9 parts, excluding
    'complaint' suppliers (names ending in 7) via a broadcast
    anti-join — the NOT IN subquery shape."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9") & (F.col("p_type") != "PROMO")
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q20(spark, sf_dir):
    """Excess-share shape (TPC-H Q20, reduced schema): NATION_2
    suppliers who shipped more than half of some gear part's total
    shipped quantity — nested aggregation (per-(supp,part) vs
    per-part) + semi-join into the supplier dim."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty = _dec("l_quantity", "decimal(12,2)")
    per_sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(qty).alias("supp_qty"))
    per_p = li.groupBy("l_partkey").agg(F.sum(qty).alias("part_qty"))
    dominant = (
        per_sp.join(per_p, "l_partkey")
        .filter(
            F.col("supp_qty") * F.lit(2).cast("decimal(2,0)") > F.col("part_qty")
        )
        .select("l_suppkey")
        .distinct()
    )
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(
        dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))


def q_tpch_q21(spark, sf_dir):
    """Waiting-orders shape (TPC-H Q21): NATION_1 suppliers who were
    the ONLY late shipper (shipdate > orderdate + 90 days) on a
    multi-supplier order. EXISTS (another supplier on the order) as a
    distinct-count condition, NOT EXISTS (another late supplier) as an
    anti condition — both from one per-order aggregate instead of two
    correlated subqueries, so lineitem is scanned once for the
    order-level facts and once for the candidate rows."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    sole_late = (
        lo.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        sole_late.join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q_embedding_quantize(spark, sf_dir):
    """Per-dimension affine uint8 quantization of the embedding matrix
    (exact-arithmetic codes — see operators/embeddings.py)."""
    from shaha_spark.operators.embeddings import quantize_int8

    return quantize_int8(_t(spark, sf_dir, "embeddings"))


def q_embedding_bucket_dedup(spark, sf_dir):
    """Sign-bit (orthant) bucket dedup of embeddings: lowest id kept
    per d-bit signature."""
    from shaha_spark.operators.embeddings import dedup_by_bucket

    return dedup_by_bucket(_t(spark, sf_dir, "embeddings"))


def q_embedding_top_pc(spark, sf_dir):
    """Dominant principal direction by integer-exact power iteration
    (2 rounds, 2^20 grid) — bit-identical across engines."""
    from shaha_spark.operators.embeddings import top_principal_component

    return top_principal_component(_t(spark, sf_dir, "embeddings"), iters=2)


def q_docs_unigram_logprob(spark, sf_dir):
    """Per-document average unigram log-likelihood under the corpus LM
    (cheap fluency/quality score; determinism via per-TERM rounded ln
    + decimal-exact per-doc sums)."""
    from shaha_spark.operators.terms import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


#: per-language target mixture for docs_mix_resample — chosen to keep
#: all of the smallest stratum while thinning the dominant one; the
#: SQL twin is generated from this same dict.
MIX_RATES: dict[str, float] = {"en": 0.5, "de": 1.0, "es": 0.75, "fr": 0.25, "zh": 0.1}


def q_docs_gopher_filter(spark, sf_dir):
    """Gopher-style rule-based quality filter: per-doc metrics, one
    flag per rule, conjunctive keep decision
    (operators.textops.gopher_rules; Rae et al. 2021 §A.1.1)."""
    from shaha_spark.operators.textops import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"))


def q_docs_mix_resample(spark, sf_dir):
    """Domain-mixture construction: per-language deterministic
    hash-sampling to target rates — downsample the dominant language,
    keep rare ones (operators.sampling.stratified_hash_sample)."""
    from shaha_spark.operators.sampling import stratified_hash_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_hash_sample(docs, "lang", MIX_RATES, "doc_id", salt="mix")


def q_docs_dup_grams(spark, sf_dir):
    """Per-document corpus-duplicate 5-gram fraction — span-level
    boilerplate detection complementing whole-doc MinHash
    (operators.terms.dup_gram_stats)."""
    from shaha_spark.operators.terms import dup_gram_stats

    return dup_gram_stats(_t(spark, sf_dir, "documents"), n=5)


def q_docs_bigram_logprob(spark, sf_dir):
    """Per-document average bigram conditional log-likelihood under the
    corpus's own bigram LM — order-sensitive fluency scoring
    (operators.terms.bigram_logprob)."""
    from shaha_spark.operators.terms import bigram_logprob

    return bigram_logprob(_t(spark, sf_dir, "documents"))


def q_docs_bpe_pairs(spark, sf_dir):
    """Top-20 adjacent character-pair frequencies over the vocabulary —
    the count table for one BPE merge step, tokenizer-training support
    (operators.terms.bpe_pair_counts)."""
    from shaha_spark.operators.terms import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), k=20)


# --------------------------------------------------------------------
# DuckDB oracle SQL (generated from the same constants)
# --------------------------------------------------------------------

_WORDS_CTE = """words AS (
  SELECT w AS word, source, doc_id FROM (
    SELECT unnest(string_split(text, ' ')) AS w, source, doc_id FROM documents
  ) WHERE w <> ''
)"""

_DWORDS_CTE = _WORDS_CTE + ",\ndwords AS (SELECT DISTINCT word FROM words)"

_MULTI_CTE = (
    _DWORDS_CTE
    + """,
multi AS (
  SELECT md5(word) AS hash_hex, word AS preimage, 'md5' AS algorithm FROM dwords
  UNION ALL
  SELECT sha256(word) AS hash_hex, word AS preimage, 'sha256' AS algorithm FROM dwords
)"""
)

_TOKS_CTE = """toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t FROM documents
)"""

_SHINGLES_CTE = (
    _TOKS_CTE
    + """,
sh AS (
  SELECT doc_id, CASE WHEN len(t) >= 3
    THEN list_transform(range(1, len(t) - 1), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
    ELSE CAST([] AS VARCHAR[]) END AS s
  FROM toks
)"""
)


def _h28_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 7)) AS BIGINT)"


def _h32_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


def _sigs_cte() -> str:
    p = MERSENNE_P
    mh_cols = ",\n    ".join(
        f"coalesce(list_min(list_transform(h, v -> ({a} * v + {b}) % {p})), CAST({p} AS BIGINT)) AS mh_{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    return (
        _SHINGLES_CTE
        + f""",
hs AS (
  SELECT doc_id, list_transform(s, x -> {_h28_sql('x')}) AS h FROM sh
),
sigs AS (
  SELECT doc_id,
    {mh_cols}
  FROM hs
)"""
    )


def _bands_cte() -> str:
    selects = []
    for band in range(LSH_BANDS):
        lo = band * LSH_ROWS_PER_BAND
        key = " || '-' || ".join(
            f"CAST(mh_{i} AS VARCHAR)" for i in range(lo, lo + LSH_ROWS_PER_BAND)
        )
        selects.append(
            f"SELECT doc_id, {band} AS band_idx, {key} AS band_key FROM fsigs"
        )
    # shingle-less docs share the all-sentinel signature; exclude before
    # banding (mirrors operators/dedup.lsh_candidate_pairs — at scale the
    # sentinel bucket would be one quadratic mega-bucket)
    return (
        f"fsigs AS (SELECT * FROM sigs WHERE mh_0 <> {MERSENNE_P}),\n"
        "bands AS (\n  " + "\n  UNION ALL\n  ".join(selects) + "\n)"
    )


def _pairs_cte() -> str:
    return (
        _sigs_cte()
        + ",\n"
        + _bands_cte()
        + """,
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""
    )




def _simhash_terms() -> str:
    terms = []
    for j in range(32):
        terms.append(
            f"CASE WHEN 2 * SUM(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE 0 END) - COUNT(*) > 0 "
            f"THEN CAST(1 AS BIGINT) << {j} ELSE 0 END"
        )
    return " + ".join(terms)


def _all_algos_sql() -> str:
    """Oracle for build_all_algos: md5/sha256 computed natively by
    DuckDB; the other seven asserted against the literal known-answer
    table (provenance: scripts/gen_digest_vectors.py)."""
    from shaha_spark.functions.digest_vectors import VECTOR_DIGESTS

    vec_words = sorted(VECTOR_DIGESTS)
    in_list = ", ".join(f"'{w}'" for w in vec_words)
    rows = []
    for w in vec_words:
        for algo, hx in VECTOR_DIGESTS[w].items():
            if algo in ("md5", "sha256"):
                continue
            rows.append(f"('{w}', '{algo}', '{hx}')")
    values = ",\n  ".join(rows)
    return f"""WITH {_DWORDS_CTE},
dw AS (
  SELECT word FROM (SELECT word FROM dwords UNION SELECT 'hello' AS word)
  WHERE word IN ({in_list})
),
vec(preimage, algorithm, hash_hex) AS (VALUES
  {values}
)
SELECT md5(word) AS hash_hex, word AS preimage, 'md5' AS algorithm FROM dw
UNION ALL
SELECT sha256(word) AS hash_hex, word AS preimage, 'sha256' AS algorithm FROM dw
UNION ALL
SELECT v.hash_hex, v.preimage, v.algorithm
FROM vec v JOIN dw ON v.preimage = dw.word"""


def _kmeans_parts(
    k: int = 4,
    iters: int = 2,
    prefix: str = "",
    src: str = "SELECT vec_id, embedding AS e FROM embeddings",
) -> list[str]:
    """CTE parts for the kmeans_fit oracle: one assignment + one
    decimal-exact mean CTE pair per iteration, mirroring
    operators/kmeans.py step for step (init = k lowest ids, cosine
    argmax with id-asc ties, float-rounded means, empty clusters keep
    the previous centroid). Final centroids land in CTE
    ``{prefix}c{iters}``. ``prefix``/``src`` let callers chain several
    independent fits in one statement (the PQ per-subspace codebooks:
    src slices the vector, prefix namespaces the CTEs)."""
    p_ = prefix
    parts = [
        f"{p_}v AS ({src})",
        """{p}c0 AS (
  SELECT centroid_id, cv, CAST(0 AS BIGINT) AS n_members FROM (
    SELECT row_number() OVER (ORDER BY vec_id ASC) AS centroid_id,
           CAST(e AS DOUBLE[]) AS cv
    FROM (SELECT vec_id, e FROM {p}v ORDER BY vec_id ASC LIMIT {k})
  )
)""".format(k=k, p=p_),
    ]
    for i in range(1, iters + 1):
        prev = f"{p_}c{i-1}"
        parts.append(f"""{p_}a{i} AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(CAST(v.e AS DOUBLE[]), c.cv) DESC,
                      c.centroid_id ASC
           ) AS r
    FROM {p_}v v CROSS JOIN {prev} c
  ) WHERE r = 1
)""")
        # NB: comp must widen to DOUBLE before the DECIMAL cast — DuckDB
        # scales FLOAT→DECIMAL in float32 arithmetic, losing ~7 digits
        parts.append(f"""{p_}m{i} AS (
  SELECT centroid_id, p,
         CAST(CAST(CAST(SUM(CAST(CAST(comp AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS FLOAT) AS DOUBLE) AS m,
         COUNT(*) AS n
  FROM (SELECT centroid_id, unnest(e) AS comp,
               unnest(range(1, len(e) + 1)) AS p FROM {p_}a{i})
  GROUP BY centroid_id, p
)""")
        parts.append(f"""{p_}c{i} AS (
  SELECT p.centroid_id,
         CASE WHEN mv.cv IS NULL THEN p.cv ELSE mv.cv END AS cv,
         CAST(coalesce(mv.n, 0) AS BIGINT) AS n_members
  FROM {prev} p LEFT JOIN (
    SELECT centroid_id, list(m ORDER BY p) AS cv, min(n) AS n
    FROM {p_}m{i} GROUP BY centroid_id
  ) mv USING (centroid_id)
)""")
    return parts


def _kmeans_sql(k: int = 4, iters: int = 2) -> str:
    ctes = ",\n".join(_kmeans_parts(k, iters))
    return f"""WITH {ctes}
SELECT centroid_id, n_members, p - 1 AS pos, comp FROM (
  SELECT centroid_id, n_members, unnest(cv) AS comp,
         unnest(range(1, len(cv) + 1)) AS p
  FROM c{iters}
)"""


def _ivf_kmeans_sql(k: int = 4, iters: int = 2, nprobe: int = 2, topk: int = 5) -> str:
    """End-to-end ANN pipeline oracle: the kmeans CTE chain feeds the
    IVF assignment/probe/rank, so training AND search sit inside one
    value-hash comparison."""
    cent = f"c{iters}"
    parts = _kmeans_parts(k, iters) + [
        """q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
)""",
        f"""fassign AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(CAST(v.e AS DOUBLE[]), c.cv) DESC,
                      c.centroid_id ASC
           ) AS r
    FROM v CROSS JOIN {cent} c
  ) WHERE r = 1
)""",
        f"""probe AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.query_id, q.qv, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.centroid_id ASC
           ) AS r
    FROM q CROSS JOIN {cent} c
  ) WHERE r <= {nprobe}
)""",
        """scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(CAST(a.e AS DOUBLE[]), p.qv), 6) AS cosine
  FROM fassign a JOIN probe p USING (centroid_id)
)""",
    ]
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {topk}"""


def _langid_scores() -> tuple[str, str]:
    score_cols = []
    for lang in sorted(LANG_STOPWORDS):
        lst = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"
        score_cols.append(
            f"CAST(len(list_filter(t, w -> list_contains({lst}, w))) AS BIGINT) AS score_{lang}"
        )
    langs = sorted(LANG_STOPWORDS)
    m = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred = f"CASE WHEN {m} = 0 THEN 'und' "
    pred += " ".join(
        f"WHEN score_{lang} = {m} THEN '{lang}'" for lang in langs[:-1]
    )
    pred += f" ELSE '{langs[-1]}' END"
    return ",\n    ".join(score_cols), pred


def oracle_sql() -> dict[str, str]:
    from shaha_spark.operators.checks import check_rules_sql
    from shaha_spark.operators.graph import pagerank_fixed_sql
    from shaha_spark.operators.layout import zorder_value_sql
    from shaha_spark.operators.profile import (
        group_quantiles_sql,
        histogram_sql,
        pearson_corr_sql,
    )
    from shaha_spark.operators.sampling import bucket_sql
    from shaha_spark.operators.sketch import hll_distinct_sql

    p = MERSENNE_P
    k = FINGERPRINT_K
    stop_en = "[" + ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS) + "]"
    score_cols, pred = _langid_scores()
    sql: dict[str, str] = {}

    sql["wordlist_scan"] = f"WITH {_WORDS_CTE} SELECT word, source FROM words"
    sql["word_dedup"] = f"WITH {_DWORDS_CTE} SELECT word FROM dwords"
    sql["build_sha256"] = (
        f"WITH {_DWORDS_CTE} SELECT sha256(word) AS hash_hex, word AS preimage, "
        "'sha256' AS algorithm FROM dwords"
    )
    sql["build_multi_algo"] = f"WITH {_MULTI_CTE} SELECT * FROM multi"
    sql["build_all_algos"] = _all_algos_sql()
    sql["query_point_lookup"] = (
        f"WITH {_DWORDS_CTE} SELECT sha256(word) AS hash_hex, word AS preimage, "
        f"'sha256' AS algorithm FROM dwords WHERE sha256(word) = '{POINT_SHA256}'"
    )
    sql["query_prefix"] = (
        f"WITH {_DWORDS_CTE} SELECT sha256(word) AS hash_hex, word AS preimage "
        "FROM dwords WHERE sha256(word) LIKE 'b9%'"
    )
    sql["query_algo_filter"] = (
        f"WITH {_MULTI_CTE} SELECT * FROM multi WHERE algorithm = 'md5'"
    )
    sql["query_topk_by_hash"] = (
        f"WITH {_MULTI_CTE} SELECT * FROM multi ORDER BY hash_hex LIMIT 100"
    )
    sql["append_merge"] = f"""WITH {_WORDS_CTE},
flags AS (
  SELECT word, bool_or(doc_id % 2 = 0) AS has_even, bool_or(doc_id % 2 = 1) AS has_odd
  FROM words GROUP BY word
)
SELECT sha256(word) AS hash_hex, word AS preimage, 'sha256' AS algorithm,
  CASE WHEN has_even AND has_odd THEN 'even,odd'
       WHEN has_even THEN 'even' ELSE 'odd' END AS sources_str
FROM flags"""
    sql["db_stats"] = f"""WITH {_MULTI_CTE}
SELECT count(*) AS total_records,
       count(DISTINCT preimage) AS n_preimages,
       string_agg(DISTINCT algorithm, ',' ORDER BY algorithm) AS algorithms_str
FROM multi"""
    sql["build_summary"] = f"""WITH {_WORDS_CTE}
SELECT count(*) AS total_words,
       count(DISTINCT word) AS unique_words,
       count(*) - count(DISTINCT word) AS duplicates,
       count(DISTINCT word) * 2 AS records_to_generate
FROM words"""
    sql["tpch_q1"] = """SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""
    sql["tpch_q3"] = """SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
  o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10"""
    sql["events_hourly"] = """SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
  event_type,
  count(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2"""
    sql["events_sessionize"] = f"""WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > {SESSION_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, tus,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id, count(*) AS n_events,
       min(tus) AS session_start_us, max(tus) AS session_end_us
FROM sess GROUP BY user_id, session_id"""
    sql["events_json_extract"] = (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value FROM events"
    )
    sql["events_asof_join"] = """WITH su0 AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, value,
    row_number() OVER (PARTITION BY user_id, epoch_us(ts) ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'signup'
),
su AS (SELECT user_id, tus, event_id, value FROM su0 WHERE rn = 1),
pu AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus
  FROM events WHERE event_type = 'purchase'
)
SELECT pu.event_id, pu.user_id, pu.tus,
  su.tus AS asof_tus, su.event_id AS asof_event_id, su.value AS asof_value
FROM pu ASOF LEFT JOIN su ON pu.user_id = su.user_id AND pu.tus >= su.tus"""
    sql["events_interval_join"] = f"""WITH iv AS (
  SELECT event_id AS interval_id, user_id, epoch_us(ts) AS start_us,
    epoch_us(ts) + {ATTRIB_WINDOW_US} AS end_us
  FROM events WHERE event_type = 'signup'
),
pu AS (
  SELECT user_id, epoch_us(ts) AS tus, value
  FROM events WHERE event_type = 'purchase'
)
SELECT iv.interval_id, iv.user_id, count(*) AS n_in_window,
  CAST(SUM(CAST(pu.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM pu JOIN iv ON pu.user_id = iv.user_id
  AND pu.tus >= iv.start_us AND pu.tus < iv.end_us
GROUP BY 1, 2"""
    sql["docs_pagerank"] = pagerank_fixed_sql(
        _pairs_cte() + ",\npr_edges AS (SELECT id_a, id_b FROM pairs)",
        iterations=3,
    )
    sql["events_transitions"] = """WITH nxt AS (
  SELECT event_type,
    coalesce(lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 'END') AS next_type
  FROM events
)
SELECT event_type, next_type, count(*) AS n FROM nxt GROUP BY 1, 2"""
    sql["events_funnel"] = f"""WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > {SESSION_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, event_id, tus, event_type,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
st1 AS (
  SELECT *, max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id, session_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS s1
  FROM sess
),
st2 AS (
  SELECT *, max(CASE WHEN event_type = 'click' AND s1 = 1 THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id, session_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS s2
  FROM st1
),
st3 AS (
  SELECT *, max(CASE WHEN event_type = 'purchase' AND s2 = 1 THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id, session_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS s3
  FROM st2
),
per_session AS (
  SELECT user_id, session_id, max(s1) + max(s2) + max(s3) AS funnel_stage
  FROM st3 GROUP BY 1, 2
)
SELECT CAST(funnel_stage AS INTEGER) AS funnel_stage, count(*) AS n_sessions
FROM per_session GROUP BY 1"""
    sql["events_histogram"] = histogram_sql(
        "(SELECT value FROM events)", "value", bins=12
    )
    qf_t = "(CAST(n - 1 AS DOUBLE) * 0.25)"
    qf_lo = f"max(CASE WHEN rn = CAST(floor({qf_t}) AS BIGINT) THEN quality END) OVER (PARTITION BY source)"
    qf_hi = f"max(CASE WHEN rn = CAST(ceil({qf_t}) AS BIGINT) THEN quality END) OVER (PARTITION BY source)"
    qf_thr = f"{qf_lo} + ({qf_hi} - {qf_lo}) * ({qf_t} - floor({qf_t}))"
    sql["docs_quality_filter"] = f"""WITH base AS (
  SELECT doc_id, text, source, list_filter(string_split(text, ' '), t -> t <> '') AS t FROM documents
),
comp AS (
  SELECT doc_id, source,
    0.4 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0)
      + 0.3 * least(CASE WHEN len(t) > 0 THEN CAST(list_sum(list_transform(t, w -> length(w))) AS DOUBLE) / len(t) ELSE 0.0 END / 8.0, 1.0)
      + 0.3 * least(CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, w -> list_contains({stop_en}, w))) AS DOUBLE) / len(t) ELSE 0.0 END / 0.2, 1.0) AS quality
  FROM base
),
ranked AS (
  SELECT doc_id, source, quality,
    row_number() OVER (PARTITION BY source ORDER BY quality) - 1 AS rn,
    count(*) OVER (PARTITION BY source) AS n
  FROM comp
),
thr AS (
  SELECT doc_id, source, quality, {qf_thr} AS q_threshold FROM ranked
)
SELECT doc_id, source, quality, q_threshold FROM thr WHERE quality >= q_threshold"""
    sql["text_normalize"] = """SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text || '  X!? ' || source), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text
FROM documents"""
    sql["words_except_all"] = f"""WITH {_WORDS_CTE},
even AS (SELECT word FROM words WHERE doc_id % 2 = 0),
odd AS (SELECT word FROM words WHERE doc_id % 2 = 1)
SELECT word FROM even EXCEPT ALL SELECT word FROM odd"""
    sql["events_zorder"] = zorder_value_sql(
        "(SELECT event_id, user_id, epoch_us(ts) AS tus FROM events)",
        "user_id",
        "tus",
        "event_id",
    )
    sql["profile_correlation"] = pearson_corr_sql(
        "lineitem", "l_quantity", "l_extendedprice"
    )
    sql["dq_lineitem"] = check_rules_sql("lineitem", DQ_LINEITEM_RULES_SQL)
    sql["sample_weighted"] = f"""SELECT doc_id, n_chars FROM documents
WHERE CAST({bucket_sql('doc_id', 'wr2')} AS DOUBLE) * {WEIGHTED_MAX_CHARS!r}
  < CAST(n_chars AS DOUBLE) * 10000.0"""
    sql["tpch_q4"] = """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority"""
    sql["tpch_q13"] = """WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count"""
    sql["part_never_shipped"] = """SELECT p_brand, count(*) AS n_parts
FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey
    AND l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
    AND l_quantity >= 45
)
GROUP BY p_brand"""
    pivot_cols = ",\n  ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS \"{t}\""
        for t in EVENT_TYPES
    )
    sql["events_pivot"] = f"""SELECT
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  {pivot_cols}
FROM events GROUP BY 1"""
    unpivot_arms = "\nUNION ALL\n".join(
        f"SELECT day, '{t}' AS event_type, \"{t}\" AS n_events FROM wide"
        for t in EVENT_TYPES
    )
    sql["events_unpivot"] = f"""WITH wide AS ({sql["events_pivot"]})
{unpivot_arms}"""
    sql["events_percentiles"] = group_quantiles_sql(
        "events", "event_type", "value", [0.5, 0.95]
    )
    sql["orders_topk_per_cust"] = """WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
    ) AS rank
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 3"""
    sql["events_rolling"] = f"""SELECT event_id, user_id, epoch_us(ts) AS tus,
  count(*) OVER w AS n_7d,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {ROLLING_WINDOW_US} PRECEDING AND CURRENT ROW
)"""
    sql["events_hll_distinct"] = f"""WITH est AS (
  {hll_distinct_sql('events', 'event_id', p=6)}
),
ex AS (SELECT count(DISTINCT event_id) AS exact_distinct FROM events)
SELECT est.hll_estimate, est.n_registers, ex.exact_distinct
FROM est CROSS JOIN ex"""
    from shaha_spark.operators.sketch import (
        bloom_membership_sql,
        cms_frequencies_sql,
    )

    cms_inner = cms_frequencies_sql(
        "(SELECT w FROM (SELECT unnest(string_split(text, ' ')) AS w "
        "FROM documents) WHERE w <> '') wq",
        "w",
        CMS_PROBE_WORDS,
    )
    sql["sketch_cms_words"] = cms_inner
    bloom_inner = bloom_membership_sql(
        "SELECT text FROM documents WHERE doc_id % 3 = 0",
        "SELECT doc_id, text FROM documents",
        "text",
        "doc_id",
    )
    sql["dedup_bloom_screen"] = (
        f"SELECT doc_id, maybe_in_corpus FROM ({bloom_inner}) bs"
    )
    from shaha_spark.operators.chunking import (
        chunk_documents_sql,
        pack_sequences_sql,
    )

    from shaha_spark.operators.profile import equi_depth_histogram_sql

    sql["events_equidepth"] = equi_depth_histogram_sql(
        "events", "event_type", "value", "event_id", buckets=8
    )
    _REV = (
        "CAST(l_extendedprice AS DECIMAL(12,2)) * "
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
    )
    sql["tpch_q7"] = f"""SELECT sn.n_name AS supp_nation,
  cn.n_name AS cust_nation,
  year(l_shipdate) AS l_year,
  CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3"""
    sql["tpch_q8"] = f"""WITH j AS (
  SELECT sn.n_name AS supp_nation, year(o_orderdate) AS o_year,
    {_REV} AS rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_revenue,
  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
    / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM j GROUP BY 1"""
    sql["tpch_q9"] = f"""SELECT n_name AS nation,
  year(o_orderdate) AS o_year,
  CAST(SUM({_REV}) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2"""
    from shaha_spark.operators.profile import winsorize_sql
    from shaha_spark.operators.sampling import balanced_sample_sql
    from shaha_spark.operators.sketch import hll_group_distinct_sql

    sql["events_dim_salted_join"] = """SELECT c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1"""
    sql["users_hll_by_type"] = hll_group_distinct_sql(
        "events", "event_type", "user_id", p=6
    )
    sql["docs_balanced_sample"] = balanced_sample_sql(
        "(SELECT doc_id, lang FROM documents) d", "lang", 60, "doc_id"
    )
    sql["events_winsorized"] = winsorize_sql(
        "events", "event_type", "value", "event_id", 0.05, 0.95
    )
    sql["docs_chunked"] = chunk_documents_sql("documents", chunk=32, overlap=8)
    sql["docs_packed"] = pack_sequences_sql("documents", capacity=256)
    sql["events_rollup"] = """WITH base AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type, value
  FROM events
)
SELECT coalesce(day, 'ALL') AS day, coalesce(event_type, 'ALL') AS event_type,
  count(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM base GROUP BY ROLLUP (day, event_type)"""
    sql["text_term_stats"] = f"""WITH {_WORDS_CTE},
tf AS (SELECT doc_id, word AS term, count(*) AS tf FROM words GROUP BY 1, 2),
tfd AS (SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tfd.doc_id, tfd.term, tfd.tf, tfd.df, n.n_docs,
  CAST(tfd.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(tfd.df AS DOUBLE)) AS weight
FROM tfd CROSS JOIN n"""
    g = DECONTAM_NGRAM
    gram_parts = ", ".join(f"t[i+{j}]" for j in range(g))
    grams_expr = (
        f"CASE WHEN len(t) >= {g} THEN list_transform(range(1, len(t) - {g - 2}), "
        f"i -> concat_ws(' ', {gram_parts})) ELSE CAST([] AS VARCHAR[]) END"
    )
    sql["docs_decontaminate"] = f"""WITH {_TOKS_CTE},
split AS (
  SELECT doc_id, t, {bucket_sql('doc_id', 'r2')} AS bucket FROM toks
),
train_grams AS (
  SELECT DISTINCT doc_id, unnest({grams_expr}) AS gram
  FROM split WHERE bucket >= 1000
),
eval_grams AS (
  SELECT DISTINCT unnest({grams_expr}) AS gram
  FROM split WHERE bucket < 500
),
shared AS (
  SELECT tg.doc_id, count(*) AS n_shared_grams
  FROM train_grams tg JOIN eval_grams eg USING (gram)
  GROUP BY 1
)
SELECT s.doc_id,
  coalesce(sh.n_shared_grams, 0) AS n_shared_grams,
  CAST(coalesce(sh.n_shared_grams, 0) > 0 AS INTEGER) AS contaminated
FROM split s LEFT JOIN shared sh USING (doc_id)
WHERE s.bucket >= 1000"""
    sql["tpch_q5"] = """SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name"""
    sql["tpch_q6"] = """SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24"""
    sql["tpch_q18"] = """SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice"""
    sql["tpch_q10"] = """SELECT c_custkey, c_name,
  CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20"""
    sql["tpch_q14"] = """WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
)
SELECT promo_revenue, total_revenue,
  100.0 * promo_revenue / total_revenue AS promo_pct
FROM agg"""
    sql["tpch_q15"] = """WITH revenue AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT MAX(rev) FROM revenue)"""
    sql["tpch_q17"] = """WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
    SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (PARTITION BY l_partkey) AS sum_qty,
    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM brand_li
WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty"""
    sql["tpch_q19"] = """SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)"""
    sql["tpch_q22"] = """WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS t
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, thr
WHERE CAST(c_acctbal AS DOUBLE) > t
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey"""
    sql["text_vocab"] = """WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
FROM toks WHERE term <> ''
GROUP BY term
ORDER BY n_occurrences DESC, term ASC
LIMIT 10"""
    sql["text_oov"] = """WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tk2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS n FROM tk2 GROUP BY term
  ) ORDER BY n DESC, term ASC LIMIT 10
),
per AS (
  SELECT t.doc_id, count(*) AS n_tokens,
    sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM tk2 t LEFT JOIN vocab v ON t.term = v.term
  GROUP BY t.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(n_oov, 0) AS BIGINT) AS n_oov,
  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN 0.0
       ELSE CAST(COALESCE(n_oov, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
  END AS oov_rate
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"""
    sql["docs_repetition"] = """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
z AS (
  SELECT doc_id, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS pos FROM toks
),
z2 AS (SELECT doc_id, w, pos FROM z WHERE w <> ''),
g AS (
  SELECT doc_id,
    concat_ws(' ', w, lead(w, 1) OVER win, lead(w, 2) OVER win) AS gram,
    lead(w, 2) OVER win AS last3
  FROM z2 WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
per AS (
  SELECT doc_id, count(*) AS n_grams, count(DISTINCT gram) AS n_unique_grams
  FROM g WHERE last3 IS NOT NULL GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
  CAST(COALESCE(n_unique_grams, 0) AS BIGINT) AS n_unique_grams,
  CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
       ELSE CAST(n_grams - n_unique_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
  END AS dup_gram_ratio
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"""
    sql["docs_cosine_pairs"] = """WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tk2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk2 GROUP BY 1, 2),
n AS (SELECT count(*) AS nd FROM documents),
w AS (
  SELECT doc_id, term, tf * (nd // df) AS wt
  FROM (SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf), n
),
norms AS (SELECT doc_id, sum(wt * wt) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.wt * b.wt) AS dot
  FROM w a JOIN w b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cosv AS (
  SELECT id_a, id_b,
    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))) AS cosine
  FROM dots
  JOIN norms na ON na.doc_id = id_a
  JOIN norms nb ON nb.doc_id = id_b
)
SELECT id_a, id_b, cosine FROM cosv WHERE cosine >= 0.9"""
    sql["events_redact"] = """SELECT event_id,
  regexp_replace(props, '[0-9]+', '<num>', 'g') AS redacted,
  CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
FROM events"""
    sql["words_lev_pairs"] = f"""WITH {_DWORDS_CTE}
SELECT a.word AS word_a, b.word AS word_b,
  CAST(levenshtein(a.word, b.word) AS INTEGER) AS dist
FROM dwords a JOIN dwords b ON a.word < b.word
WHERE levenshtein(a.word, b.word) <= 2"""
    sql["events_retention"] = """WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN c USING (user_id)
GROUP BY 1, 2"""
    from shaha_spark.operators.profile import zscore_outliers_sql

    sql["events_outliers"] = zscore_outliers_sql(
        "events", "value", ["event_type"], "event_id", 3.0
    )
    sql["dedup_minhash_eval"] = f"""WITH {_pairs_cte()},
ex0 AS (SELECT doc_id, unnest(s) AS shv FROM sh),
ex AS (SELECT DISTINCT doc_id, shv FROM ex0),
szs AS (
  SELECT doc_id, shv, COUNT(*) OVER (PARTITION BY doc_id) AS sz FROM ex
),
ov AS (
  SELECT a.doc_id AS t_ia, b.doc_id AS t_ib,
    count(*) AS inter, max(a.sz) AS la, max(b.sz) AS lb
  FROM szs a JOIN szs b ON a.shv = b.shv AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT t_ia, t_ib FROM ov
  WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= 0.5
),
j AS (
  SELECT CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS c,
         CASE WHEN t.t_ia IS NOT NULL THEN 1 ELSE 0 END AS tt
  FROM pairs p FULL OUTER JOIN truth t ON p.id_a = t.t_ia AND p.id_b = t.t_ib
)
SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_candidates,
  CAST(COALESCE(SUM(tt), 0) AS BIGINT) AS n_true,
  CAST(COALESCE(SUM(c * tt), 0) AS BIGINT) AS n_hit,
  CASE WHEN COALESCE(SUM(c), 0) = 0 THEN 1.0
       ELSE CAST(SUM(c * tt) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) END AS lsh_precision,
  CASE WHEN COALESCE(SUM(tt), 0) = 0 THEN 1.0
       ELSE CAST(SUM(c * tt) AS DOUBLE) / CAST(SUM(tt) AS DOUBLE) END AS lsh_recall
FROM j"""
    sql["part_filter"] = """SELECT p_partkey, p_name, p_brand, p_retailprice
FROM part WHERE p_name LIKE '%small%' AND p_size >= 10"""
    sql["events_salted_agg"] = """SELECT event_type,
  count(*) AS n_rows,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type"""
    from shaha_spark.operators.profile import profile_sql

    sql["profile_lineitem"] = profile_sql("lineitem", "l_extendedprice")
    from shaha_spark.operators.profile import table_profile_sql

    sql["profile_table"] = table_profile_sql("lineitem", PROFILE_COLS)
    sql["words_intersect"] = f"""WITH {_WORDS_CTE}
SELECT word FROM words WHERE doc_id % 2 = 0
INTERSECT
SELECT word FROM words WHERE doc_id % 2 = 1"""
    sql["words_except"] = f"""WITH {_WORDS_CTE}
SELECT word FROM words
EXCEPT
SELECT word FROM words WHERE doc_id = 0"""
    sql["dedup_exact"] = (
        "SELECT min(doc_id) AS doc_id, md5(text) AS content_md5 FROM documents GROUP BY md5(text)"
    )
    mh_names = ", ".join(f"mh_{i}" for i in range(len(MINHASH_PERMS)))
    sql["dedup_minhash_sigs"] = f"WITH {_sigs_cte()} SELECT doc_id, {mh_names} FROM sigs"
    sql["dedup_minhash_pairs"] = f"WITH {_pairs_cte()} SELECT id_a, id_b FROM pairs"
    sql["dedup_ngram_jaccard"] = f"""WITH {_pairs_cte()},
sets AS (SELECT doc_id, list_distinct(s) AS ds FROM sh),
j AS (
  SELECT p.id_a, p.id_b,
    len(list_filter(a.ds, x -> list_contains(b.ds, x))) AS inter,
    len(a.ds) AS la, len(b.ds) AS lb
  FROM pairs p JOIN sets a ON a.doc_id = p.id_a JOIN sets b ON b.doc_id = p.id_b
)
SELECT id_a, id_b,
  CASE WHEN la + lb - inter > 0 THEN CAST(inter AS DOUBLE) / (la + lb - inter) ELSE 0.0 END AS jaccard
FROM j
WHERE CASE WHEN la + lb - inter > 0 THEN CAST(inter AS DOUBLE) / (la + lb - inter) ELSE 0.0 END >= 0.5"""
    k_perms = len(MINHASH_PERMS)
    match_terms = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(k_perms)
    )
    sql["dedup_minhash_survivors"] = f"""WITH {_pairs_cte()},
sims AS (
  SELECT p.id_a, p.id_b,
    CAST({match_terms} AS DOUBLE) / {k_perms} AS est_jaccard
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.id_a
  JOIN sigs sb ON sb.doc_id = p.id_b
),
losers AS (SELECT DISTINCT id_b AS doc_id FROM sims WHERE est_jaccard >= 0.7)
SELECT d.doc_id FROM documents d LEFT JOIN losers l USING (doc_id) WHERE l.doc_id IS NULL"""
    sql["dedup_incremental"] = f"""WITH {_sigs_cte()},
{_bands_cte()},
cross_pairs AS (
  SELECT DISTINCT o.doc_id AS id_a, n.doc_id AS id_b
  FROM bands o JOIN bands n
    ON o.band_idx = n.band_idx AND o.band_key = n.band_key
  WHERE o.doc_id % 2 = 0 AND n.doc_id % 2 = 1
),
new_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
    AND a.doc_id < b.doc_id
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
),
all_pairs AS (SELECT * FROM cross_pairs UNION SELECT * FROM new_pairs),
sims AS (
  SELECT p.id_a, p.id_b,
    CAST({match_terms} AS DOUBLE) / {k_perms} AS est_jaccard
  FROM all_pairs p
  JOIN sigs sa ON sa.doc_id = p.id_a
  JOIN sigs sb ON sb.doc_id = p.id_b
),
losers AS (SELECT DISTINCT id_b AS doc_id FROM sims WHERE est_jaccard >= 0.7)
SELECT d.doc_id FROM documents d LEFT JOIN losers l USING (doc_id)
WHERE d.doc_id % 2 = 1 AND l.doc_id IS NULL"""
    # transitive (connected-components) variant: the oracle states the
    # fixpoint directly — comp(v) = min id reachable from v — as a
    # recursive CTE, independent of the Spark loop's iteration count
    sql["dedup_minhash_cc"] = f"""WITH RECURSIVE {_pairs_cte()},
sims AS (
  SELECT p.id_a, p.id_b,
    CAST({match_terms} AS DOUBLE) / {k_perms} AS est_jaccard
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.id_a
  JOIN sigs sb ON sb.doc_id = p.id_b
),
ed AS (
  SELECT id_a AS src, id_b AS dst FROM sims WHERE est_jaccard >= 0.7
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM sims WHERE est_jaccard >= 0.7
),
reach(id, comp) AS (
  SELECT src, src FROM ed
  UNION
  SELECT e.src, r.comp FROM ed e JOIN reach r ON r.id = e.dst
),
comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
cc_losers AS (SELECT id AS doc_id FROM comp WHERE comp <> id)
SELECT d.doc_id FROM documents d LEFT JOIN cc_losers l USING (doc_id) WHERE l.doc_id IS NULL"""
    sql["dedup_simhash_pairs"] = f"""WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
h AS (SELECT doc_id, {_h32_sql('w')} AS hv FROM tok),
agg AS (SELECT doc_id, CAST({_simhash_terms()} AS BIGINT) AS sh FROM h GROUP BY doc_id),
fps AS (
  SELECT d.doc_id, CAST(coalesce(a.sh, 0) AS BIGINT) AS simhash
  FROM documents d LEFT JOIN agg a USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
    sql["dedup_simhash"] = f"""WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
h AS (SELECT doc_id, {_h32_sql('w')} AS hv FROM tok),
agg AS (SELECT doc_id, CAST({_simhash_terms()} AS BIGINT) AS sh FROM h GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(a.sh, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN agg a USING (doc_id)"""
    sql["similarity_topk"] = """WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT query_id, vec_id, round(list_cosine_similarity(cv, qv), 6) AS cosine
  FROM c, q
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5"""
    # IVF ANN: same deterministic construction as operators/similarity.py —
    # decimal-exact centroid means cast through FLOAT, argmax assignment and
    # nprobe probing as row_number windows with (sim DESC, id ASC) tiebreaks.
    sql["similarity_ivf"] = """WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
pos AS (
  SELECT label, unnest(embedding) AS comp,
         unnest(range(1, len(embedding) + 1)) AS p
  FROM embeddings
),
cent AS (
  SELECT label AS centroid_id, p,
         CAST(CAST(CAST(SUM(CAST(CAST(comp AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS FLOAT) AS DOUBLE) AS m
  FROM pos GROUP BY label, p
),
cvec AS (SELECT centroid_id, list(m ORDER BY p) AS cv FROM cent GROUP BY centroid_id),
assign AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(v.e, c.cv) DESC, c.centroid_id ASC
           ) AS r
    FROM v CROSS JOIN cvec c
  ) WHERE r = 1
),
probe AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.query_id, q.qv, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.centroid_id ASC
           ) AS r
    FROM q CROSS JOIN cvec c
  ) WHERE r <= 3
),
scored AS (
  SELECT p.query_id, a.vec_id, round(list_cosine_similarity(a.e, p.qv), 6) AS cosine
  FROM assign a JOIN probe p USING (centroid_id)
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5"""
    from shaha_spark.operators.sampling import bucket_sql

    sql["sample_documents"] = (
        "SELECT doc_id, source FROM documents "
        f"WHERE {bucket_sql('doc_id', 'r2')} < 1000"
    )
    # bucket ranges in sorted split-name order: eval [0,500), test
    # [500,1000), train [1000,10000) — mirrors sampling.hash_split
    sql["split_documents"] = f"""WITH b AS (
  SELECT {bucket_sql('doc_id', 'r2')} AS bucket FROM documents
)
SELECT CASE WHEN bucket < 500 THEN 'eval'
            WHEN bucket < 1000 THEN 'test'
            ELSE 'train' END AS split,
       count(*) AS n_docs
FROM b GROUP BY 1"""
    sql["kmeans_centroids"] = _kmeans_sql(k=4, iters=2)
    sql["similarity_ivf_kmeans"] = _ivf_kmeans_sql(k=4, iters=2, nprobe=2, topk=5)
    sql["embedding_near_dup"] = """WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS cosine
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.4"""
    sql["text_token_count"] = f"""SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT) AS n_pieces
FROM documents"""
    sql["text_quality"] = f"""WITH base AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), t -> t <> '') AS t FROM documents
),
comp AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(t) AS BIGINT) AS n_tokens,
    CASE WHEN len(t) > 0 THEN CAST(list_sum(list_transform(t, w -> length(w))) AS DOUBLE) / len(t) ELSE 0.0 END AS mean_token_len,
    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, w -> list_contains({stop_en}, w))) AS DOUBLE) / len(t) ELSE 0.0 END AS stopword_ratio
  FROM base
)
SELECT doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio,
  0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
      + 0.3 * least(mean_token_len / 8.0, 1.0)
      + 0.3 * least(stopword_ratio / 0.2, 1.0) AS quality
FROM comp"""
    sql["text_langid"] = f"""WITH {_TOKS_CTE},
scored AS (
  SELECT doc_id,
    {score_cols}
  FROM toks
)
SELECT doc_id, score_de, score_en, score_es, score_fr,
  {pred} AS lang_pred
FROM scored"""
    sql["text_fingerprint"] = f"""WITH {_TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS w, unnest(range(1, len(t) + 1)) AS p FROM toks
),
terms AS (
  SELECT doc_id, ((p * {k}) % {MERSENNE_P}) * {_h28_sql('w')} % {MERSENNE_P} AS term FROM pos
),
agg AS (SELECT doc_id, SUM(term) % {MERSENNE_P} AS fp FROM terms GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(a.fp, 0) AS BIGINT) AS fingerprint
FROM documents d LEFT JOIN agg a USING (doc_id)"""
    sql["multimodal_meta"] = f"""SELECT doc_id AS media_id,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  (['jpeg', 'png', 'webp'])[(strlen(text) % 3) + 1] AS format,
  CAST(64 + strlen(text) % 512 AS INTEGER) AS width,
  CAST(64 + (strlen(text) * 31) % 512 AS INTEGER) AS height
FROM documents"""
    sql["multimodal_frame_count"] = """SELECT doc_id AS media_id,
  CAST(least(4, greatest(1, strlen(text) // 32)) AS BIGINT) AS n_frames
FROM documents"""
    sql["tpch_q2"] = """WITH offers AS (
  SELECT p_partkey, p_name, s_name, n_name,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_name LIKE '%gear%' AND r_name = 'EUROPE'
),
best AS (SELECT p_partkey, MIN(price) AS min_price FROM offers GROUP BY p_partkey)
SELECT o.p_partkey, o.p_name,
       MIN(o.s_name) AS s_name,
       CAST(MIN(b.min_price) AS DOUBLE) AS min_price
FROM offers o JOIN best b ON o.p_partkey = b.p_partkey AND o.price = b.min_price
GROUP BY o.p_partkey, o.p_name"""
    sql["tpch_q11"] = """WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM pv, (SELECT SUM(part_value) AS total_value FROM pv)
WHERE part_value * 1000 > total_value"""
    sql["tpch_q12"] = """SELECT l_returnflag AS ship_class,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag"""
    sql["tpch_q16"] = """SELECT p_brand, p_type, p_size,
  COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size"""
    sql["tpch_q20"] = """WITH g AS (
  SELECT l_suppkey, l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%gear%'
),
per_sp AS (SELECT l_suppkey, l_partkey, SUM(qty) AS supp_qty FROM g GROUP BY l_suppkey, l_partkey),
per_p AS (SELECT l_partkey, SUM(qty) AS part_qty FROM g GROUP BY l_partkey),
dominant AS (
  SELECT DISTINCT l_suppkey FROM per_sp JOIN per_p USING (l_partkey)
  WHERE supp_qty * 2 > part_qty
)
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2' AND s_suppkey IN (SELECT l_suppkey FROM dominant)"""
    sql["tpch_q21"] = """WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supps
  FROM lo GROUP BY l_orderkey
),
sole AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lo JOIN per_order USING (l_orderkey)
  WHERE is_late AND n_supps >= 2 AND n_late_supps = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM sole
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
GROUP BY s_name"""
    _EMB_STATS = """v AS (SELECT vec_id, embedding AS e FROM embeddings),
x AS (SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS p FROM v),
s AS (SELECT p, CAST(min(x) AS DOUBLE) AS mn, CAST(max(x) AS DOUBLE) AS mx FROM x GROUP BY p)"""
    sql["embedding_quantize"] = f"""WITH {_EMB_STATS}
SELECT vec_id, p - 1 AS pos,
  CASE WHEN mx = mn THEN 0
       ELSE LEAST(255, CAST(FLOOR((CAST(x AS DOUBLE) - mn) / (mx - mn) * 256.0) AS INTEGER))
  END AS code
FROM x JOIN s USING (p)"""
    sql["embedding_bucket_dedup"] = f"""WITH {_EMB_STATS},
sig AS (
  SELECT vec_id,
         string_agg(CASE WHEN CAST(x AS DOUBLE) >= (mn + mx) / 2.0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM x JOIN s USING (p) GROUP BY vec_id
)
SELECT bucket, MIN(vec_id) AS keep_id, COUNT(*) AS n_members FROM sig GROUP BY bucket"""
    # integer-exact power iteration: mirrors operators/embeddings.py
    # step for step (decimal-exact float-rounded means -> 2^20 grid ->
    # two exact matvecs in HUGEINT/DEC38 -> one rounded normalization)
    sql["embedding_top_pc"] = """WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
x AS (SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS p FROM v),
m AS (
  SELECT p,
         CAST(CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS FLOAT) AS DOUBLE) AS m
  FROM x GROUP BY p
),
g AS (
  SELECT vec_id, p, CAST(FLOOR((CAST(x AS DOUBLE) - m) * 1048576.0) AS BIGINT) AS xq
  FROM x JOIN m USING (p)
),
d1 AS (SELECT vec_id, SUM(CAST(xq AS HUGEINT)) AS dot FROM g GROUP BY vec_id),
u1 AS (SELECT p, SUM(CAST(xq AS HUGEINT) * dot) AS u FROM g JOIN d1 USING (vec_id) GROUP BY p),
d2 AS (SELECT vec_id, SUM(CAST(xq AS HUGEINT) * u) AS dot FROM g JOIN u1 USING (p) GROUP BY vec_id),
u2 AS (SELECT p, SUM(CAST(xq AS HUGEINT) * dot) AS u FROM g JOIN d2 USING (vec_id) GROUP BY p),
mx AS (SELECT MAX(ABS(u)) AS sc FROM u2)
SELECT p - 1 AS pos, ROUND(CAST(u AS DOUBLE) / CAST(sc AS DOUBLE), 9) AS comp FROM u2, mx"""
    sql["docs_unigram_logprob"] = f"""WITH {_WORDS_CTE},
toks AS (SELECT doc_id, word AS term FROM words),
lm AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
lp AS (
  SELECT term,
         CAST(ROUND(LN(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)), 8) AS DECIMAL(20,8)) AS lp
  FROM lm, (SELECT SUM(tf) AS total FROM lm)
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logprob
FROM toks JOIN lp USING (term)
GROUP BY doc_id"""
    stops_in = "(" + ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS) + ")"
    sql["docs_gopher_filter"] = f"""WITH {_WORDS_CTE},
agg AS (
  SELECT doc_id, count(*) AS n_tokens, SUM(len(word)) AS sum_len,
    SUM(CASE WHEN regexp_matches(word, '[a-zA-Z]') THEN 1 ELSE 0 END) AS n_alpha,
    SUM(CASE WHEN regexp_matches(word, '[^a-zA-Z0-9]') THEN 1 ELSE 0 END) AS n_sym,
    SUM(CASE WHEN word IN {stops_in} THEN 1 ELSE 0 END) AS n_stop
  FROM words GROUP BY 1),
m AS (
  SELECT d.doc_id,
    CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
    CASE WHEN coalesce(a.n_tokens, 0) > 0 THEN CAST(a.sum_len AS DOUBLE) / a.n_tokens ELSE 0.0 END AS mean_token_len,
    CASE WHEN coalesce(a.n_tokens, 0) > 0 THEN CAST(a.n_sym AS DOUBLE) / a.n_tokens ELSE 0.0 END AS symbol_ratio,
    CASE WHEN coalesce(a.n_tokens, 0) > 0 THEN CAST(a.n_alpha AS DOUBLE) / a.n_tokens ELSE 0.0 END AS alpha_ratio,
    CAST(coalesce(a.n_stop, 0) AS BIGINT) AS n_stopwords
  FROM documents d LEFT JOIN agg a USING (doc_id))
SELECT *,
  pass_count * pass_mean_len * pass_symbols * pass_alpha * pass_stopwords AS keep
FROM (SELECT *,
  CAST(n_tokens >= 20 AND n_tokens <= 90 AS INTEGER) AS pass_count,
  CAST(mean_token_len >= 3.0 AND mean_token_len <= 10.0 AS INTEGER) AS pass_mean_len,
  CAST(symbol_ratio <= 0.1 AS INTEGER) AS pass_symbols,
  CAST(alpha_ratio >= 0.8 AS INTEGER) AS pass_alpha,
  CAST(n_stopwords >= 2 AS INTEGER) AS pass_stopwords FROM m)"""
    mix_cases = " ".join(
        f"WHEN lang = '{v}' THEN {int(r * 10_000)}"
        for v, r in sorted(MIX_RATES.items())
    )
    sql["docs_mix_resample"] = f"""SELECT doc_id, lang, source FROM documents
WHERE {bucket_sql('doc_id', 'mix')} < CASE {mix_cases} ELSE 0 END"""
    g = 5
    gram_parts = ", ".join(f"t[i+{j}]" for j in range(g))
    grams5 = (
        f"CASE WHEN len(t) >= {g} THEN list_transform(range(1, len(t) - {g - 2}), "
        f"i -> concat_ws(' ', {gram_parts})) ELSE CAST([] AS VARCHAR[]) END"
    )
    sql["docs_dup_grams"] = f"""WITH {_TOKS_CTE},
grams AS (SELECT DISTINCT doc_id, unnest({grams5}) AS gram FROM toks),
gd AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS gdf FROM grams)
SELECT doc_id, count(*) AS n_grams,
  CAST(SUM(CASE WHEN gdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
  CAST(SUM(CASE WHEN gdf >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_fraction
FROM gd GROUP BY doc_id"""
    sql["docs_bigram_logprob"] = f"""WITH {_TOKS_CTE},
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
cc AS (SELECT w1, w2, c2, SUM(c2) OVER (PARTITION BY w1) AS c1 FROM c2),
lp AS (SELECT w1, w2,
  CAST(ROUND(LN(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)), 8) AS DECIMAL(20,8)) AS lp FROM cc)
SELECT doc_id, count(*) AS n_bigrams,
  CAST(SUM(lp) AS DOUBLE) / count(*) AS avg_logprob
FROM pairs JOIN lp USING (w1, w2) GROUP BY doc_id"""
    sql["docs_bpe_pairs"] = f"""WITH {_WORDS_CTE},
vocab AS (SELECT word AS term, count(*) AS freq FROM words GROUP BY 1),
pr AS (SELECT substr(term, i, 2) AS pair, freq
       FROM (SELECT term, freq, unnest(range(1, len(term))) AS i FROM vocab
             WHERE len(term) >= 2))
SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
FROM pr GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20"""
    return sql


# --------------------------------------------------------------------
# Driver entry points
# --------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the multi-algorithm
    hash-database build projection (the engine's core pipeline)."""
    return q_build_multi_algo(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering matters: the driver's correctness harness checks the FIRST 50
    # entries only. Never-driver-verified queries come first, then three S2
    # anchors, then entries whose last green driver row was round 1. See
    # tests/test_coverage_guard.py which enforces this invariant.
    return {
        "sketch_cms_words": q_sketch_cms,
        "dedup_bloom_screen": q_dedup_bloom_screen,
        "docs_chunked": q_docs_chunked,
        "docs_packed": q_docs_packed,
        "events_equidepth": q_events_equidepth,
        "events_dim_salted_join": q_events_dim_salted_join,
        "users_hll_by_type": q_users_hll_by_type,
        "docs_balanced_sample": q_docs_balanced_sample,
        "events_winsorized": q_events_winsorized,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "events_zorder": q_events_zorder,
        "events_percentiles": q_events_percentiles,
        "orders_topk_per_cust": q_orders_topk_per_cust,
        "profile_table": q_profile_table,
        "profile_correlation": q_profile_correlation,
        "dq_lineitem": q_dq_lineitem,
        "events_histogram": q_events_histogram,
        "events_funnel": q_events_funnel,
        "events_transitions": q_events_transitions,
        "sample_documents": q_sample_documents,
        "sample_weighted": q_sample_weighted,
        "split_documents": q_split_documents,
        "words_except_all": q_words_except_all,
        "text_normalize": q_text_normalize,
        "docs_quality_filter": q_docs_quality_filter,
        "dedup_minhash_cc": q_dedup_minhash_cc,
        "dedup_incremental": q_dedup_incremental,
        "docs_pagerank": q_docs_pagerank,
        "kmeans_centroids": q_kmeans_centroids,
        "similarity_ivf_kmeans": q_similarity_ivf_kmeans,
        "tpch_q2": q_tpch_q2,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q16": q_tpch_q16,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "embedding_quantize": q_embedding_quantize,
        "embedding_bucket_dedup": q_embedding_bucket_dedup,
        "embedding_top_pc": q_embedding_top_pc,
        "docs_unigram_logprob": q_docs_unigram_logprob,
        "docs_gopher_filter": q_docs_gopher_filter,
        "docs_mix_resample": q_docs_mix_resample,
        "docs_dup_grams": q_docs_dup_grams,
        "docs_bigram_logprob": q_docs_bigram_logprob,
        "docs_bpe_pairs": q_docs_bpe_pairs,
        "build_multi_algo": q_build_multi_algo,
        "query_point_lookup": q_point_lookup,
        "append_merge": q_append_merge,
        "profile_lineitem": q_profile_lineitem,
        "words_intersect": q_words_intersect,
        "words_except": q_words_except,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_sigs": q_minhash_sigs,
        "dedup_minhash_pairs": q_minhash_pairs,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_simhash": q_simhash,
        "dedup_simhash_pairs": q_simhash_pairs,
        "dedup_minhash_survivors": q_minhash_survivors,
        "similarity_topk": q_similarity_topk,
        "similarity_ivf": q_similarity_ivf,
        "embedding_near_dup": q_embedding_near_dup,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_frame_count": q_multimodal_frame_count,
        "wordlist_scan": q_wordlist_scan,
        "word_dedup": q_word_dedup,
        "build_sha256": q_build_sha256,
        "build_hash256": q_build_hash256,
        "build_all_algos": q_build_all_algos,
        "query_prefix": q_prefix,
        "query_algo_filter": q_algo_filter,
        "query_topk_by_hash": q_topk_by_hash,
        "db_stats": q_db_stats,
        "build_summary": q_build_summary,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q18": q_tpch_q18,
        "tpch_q10": q_tpch_q10,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q19": q_tpch_q19,
        "tpch_q22": q_tpch_q22,
        "text_vocab": q_text_vocab,
        "text_oov": q_text_oov,
        "docs_repetition": q_docs_repetition,
        "docs_cosine_pairs": q_docs_cosine_pairs,
        "events_redact": q_events_redact,
        "words_lev_pairs": q_words_lev_pairs,
        "events_retention": q_events_retention,
        "events_outliers": q_events_outliers,
        "dedup_minhash_eval": q_dedup_minhash_eval,
        "part_filter": q_part_filter,
        "events_salted_agg": q_events_salted_agg,
        "events_hourly": q_events_hourly,
        "events_sessionize": q_events_sessionize,
        "events_json_extract": q_events_json,
        "events_asof_join": q_events_asof,
        "events_interval_join": q_events_interval,
        "events_rollup": q_events_rollup,
        "text_term_stats": q_term_stats,
        "docs_decontaminate": q_decontaminate,
        "tpch_q4": q_tpch_q4,
        "tpch_q13": q_tpch_q13,
        "part_never_shipped": q_part_never_shipped,
        "events_pivot": q_events_pivot,
        "events_unpivot": q_events_unpivot,
        "events_rolling": q_events_rolling,
        "events_hll_distinct": q_events_hll,
    }
