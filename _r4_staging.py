"""Round-4 staged registrations.

Every operator shipped in round 3 WITHOUT a driver registry slot (the
50-row correctness window was exactly full of never-verified queries)
gets its `(spark, sf_dir) -> DataFrame` callable and DuckDB oracle SQL
here, locally verified by tests/test_oracle_r4.py with the driver's
exact comparison. Round-4 merge is mechanical: move these entries to
the FRONT of `__spark_entry__.queries()` / `oracle_sql()` (they have
never had a driver row) and push round-3-verified entries behind them.

`docs_bpe_encode` (iterative merge loop — non-SQL-expressible),
`emb_ivf_pq_topk` (probe-dependent composition whose two halves are
each separately oracled), and `orders_kcore` (data-dependent peeling
depth; invariant-pair-tested instead) are the deliberate rows-only
registrations; the driver records their weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from __spark_entry__ import (
    _WORDS_CTE,
    _dec,
    _events,
    _kmeans_parts,
    _pairs_cte,
    _t,
)
from shaha_spark.operators.constants import MINHASH_PERMS, QUALITY_STOPWORDS
from shaha_spark.operators.sampling import bucket_sql, h28_sql

# ----------------------------------------------------------- queries

LOGREG_DIM = 64
#: fixed deterministic demo weights for the scoring registration:
#: w_i = ((i*37) % 21 - 10) / 10  in [-1.0, 1.0]
LOGREG_WEIGHTS = [((i * 37) % 21 - 10) / 10.0 for i in range(LOGREG_DIM)]


def q_docs_line_dedup(spark, sf_dir):
    """Corpus-duplicate line removal (operators.dedup.dedup_duplicate_lines).
    Testdata texts are single-line, which exercises the degenerate-but-
    valid case: exact-duplicate texts across >=2 docs scrub entirely."""
    from shaha_spark.operators.dedup import dedup_duplicate_lines

    return dedup_duplicate_lines(_t(spark, sf_dir, "documents"), min_docs=2)


def q_docs_dup_span_removed(spark, sf_dir):
    """Exact-substring span removal at 5-gram granularity
    (operators.terms.remove_dup_gram_spans)."""
    from shaha_spark.operators.terms import remove_dup_gram_spans

    return remove_dup_gram_spans(_t(spark, sf_dir, "documents"), n=5)


def q_docs_temperature_rates(spark, sf_dir):
    """Per-language temperature-mixture sampling rates, alpha=0.7
    (operators.sampling.temperature_rates)."""
    from shaha_spark.operators.sampling import temperature_rates

    return temperature_rates(_t(spark, sf_dir, "documents"), "lang", 0.7)


def q_docs_temperature_resample(spark, sf_dir):
    """Deterministic resample to the alpha=0.7 temperature mixture
    (operators.sampling.temperature_resample)."""
    from shaha_spark.operators.sampling import temperature_resample

    return temperature_resample(
        _t(spark, sf_dir, "documents"), "lang", "doc_id", alpha=0.7
    )


def q_docs_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights of every doc against the English
    slice as target (operators.sampling.importance_weights)."""
    from shaha_spark.operators.sampling import importance_weights

    docs = _t(spark, sf_dir, "documents")
    return importance_weights(docs, docs.filter(F.col("lang") == "en"))


def q_docs_dsir_topk(spark, sf_dir):
    """Deterministic top-25 DSIR selection
    (operators.sampling.importance_resample)."""
    from shaha_spark.operators.sampling import importance_resample

    docs = _t(spark, sf_dir, "documents")
    return importance_resample(docs, docs.filter(F.col("lang") == "en"), k=25)


def q_docs_top_keywords(spark, sf_dir):
    """Top-3 ratio-idf keywords per document
    (operators.terms.top_keywords)."""
    from shaha_spark.operators.terms import top_keywords

    return top_keywords(_t(spark, sf_dir, "documents"), k=3)


def q_docs_redact(spark, sf_dir):
    """Two-class redaction (digit runs, shouted words) with per-class
    match counts (operators.textops.redact_patterns)."""
    from shaha_spark.operators.textops import redact_patterns

    return redact_patterns(
        _t(spark, sf_dir, "documents"),
        "text",
        {"num": "[0-9]+", "shout": "[A-Z][A-Z]+"},
    )


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware near-dup survivor selection: highest quality_score
    per connected component wins
    (operators.components.keep_best_per_component)."""
    from shaha_spark.operators.components import keep_best_per_component
    from shaha_spark.operators.textops import quality_score

    docs = _t(spark, sf_dir, "documents")
    return keep_best_per_component(
        docs, quality_score(docs), score_col="quality", threshold=0.7
    )


def q_docs_hashed_features(spark, sf_dir):
    """Hashed bag-of-words tf features, exploded to (doc, idx, val)
    rows (operators.classifier.hashed_features)."""
    from shaha_spark.operators.classifier import hashed_features

    feats = hashed_features(_t(spark, sf_dir, "documents"), dim=LOGREG_DIM)
    return feats.select(
        "doc_id", F.explode("feats").alias("p")
    ).select("doc_id", F.col("p.idx").alias("idx"), F.col("p.val").alias("val"))


def q_docs_logreg_score(spark, sf_dir):
    """Classifier scoring under the fixed demo weight vector
    (operators.classifier.logreg_score); probability rounded to 6
    decimals — the margin is a sequential idx-ordered fold on both
    engines, so the rounding is belt-and-braces."""
    from shaha_spark.operators.classifier import hashed_features, logreg_score

    feats = hashed_features(_t(spark, sf_dir, "documents"), dim=LOGREG_DIM)
    scored = logreg_score(feats, LOGREG_WEIGHTS, 0.0)
    return scored.select(
        "doc_id", F.round("quality_prob", 6).alias("quality_prob")
    )


def q_emb_semantic_dedup(spark, sf_dir):
    """SemDeDup: k-means (k=4, 2 Lloyd iterations) then cluster-blocked
    cosine near-dup pruning (operators.dedup.semantic_dedup)."""
    from shaha_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), k=4, iters=2, threshold=0.98
    )


def q_docs_bpe_encode(spark, sf_dir):
    """BPE round trip: train 8 merges on the corpus vocabulary, encode
    every token occurrence (operators.terms.bpe_train / bpe_encode).
    Iterative — registered rows-only (no SQL oracle)."""
    from shaha_spark.operators.terms import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    enc = bpe_encode(docs, bpe_train(docs, num_merges=8))
    return enc.select(
        "doc_id", "term", F.concat_ws(" ", "pieces").alias("pieces_joined")
    )


PQ_M = 4
PQ_K = 4
PQ_ITERS = 2
PQ_TOPK = 5


def _pq_pieces(spark, sf_dir):
    from shaha_spark.operators.pq import pq_encode, pq_train

    corpus = _t(spark, sf_dir, "embeddings")
    cb = pq_train(corpus, m=PQ_M, k=PQ_K, iters=PQ_ITERS)
    codes = pq_encode(corpus, cb)
    queries = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return corpus, cb, codes, queries


def q_emb_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k (operators.pq.pq_train /
    pq_encode / pq_topk): per-subspace codebooks chained through the
    kmeans per-iteration oracle, shuffle-free encode, broadcast ADC
    scoring."""
    from shaha_spark.operators.pq import pq_topk

    _, cb, codes, queries = _pq_pieces(spark, sf_dir)
    return pq_topk(codes, cb, queries, k=PQ_TOPK)


def q_emb_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ composition (operators.pq.ivf_pq_topk): coarse-bucket
    probe plus ADC scoring over PQ codes. The probe set depends on
    which buckets each query ranks — SQL-expressible in principle but
    the full chain (coarse kmeans + m sub-kmeans + probe + ADC) is
    registered rows-only; its two halves are each independently under
    the oracle gate (similarity_ivf_kmeans, emb_pq_topk)."""
    from shaha_spark.operators.kmeans import kmeans_fit
    from shaha_spark.operators.pq import ivf_pq_topk

    corpus, cb, _codes, queries = _pq_pieces(spark, sf_dir)
    coarse = kmeans_fit(corpus, k=PQ_K, iters=PQ_ITERS)
    return ivf_pq_topk(corpus, queries, coarse, cb, k=PQ_TOPK, nprobe=2)


def q_docs_trigram_backoff(spark, sf_dir):
    """Stupid-Backoff trigram LM scoring with a held-out LM half
    (operators.terms.trigram_backoff_logprob): the LM trains on the
    hash-split half of the corpus and scores the other half, so all
    three backoff tiers genuinely fire."""
    from shaha_spark.operators.sampling import _bucket
    from shaha_spark.operators.terms import trigram_backoff_logprob

    docs = _t(spark, sf_dir, "documents")
    bkt = _bucket(F.col("doc_id"), "lm")
    return trigram_backoff_logprob(
        docs.where(bkt >= 5000), docs.where(bkt < 5000)
    )


def q_docs_char_entropy(spark, sf_dir):
    """Per-document character Shannon entropy — the gibberish/binary
    junk screen (operators.textops.char_entropy)."""
    from shaha_spark.operators.textops import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


def q_docs_curated(spark, sf_dir):
    """The composed curation chain (pipeline.curate.curate_corpus):
    line dedup -> Gopher gate -> exact dedup (redaction and mixture off
    so the oracle stays a pure stage-twin chain)."""
    from shaha_spark.pipeline.curate import curate_corpus

    return curate_corpus(_t(spark, sf_dir, "documents"))


def q_docs_source_cap(spark, sf_dir):
    """Per-source document cap at 10 docs/source, deterministic by
    content-hash order (operators.sampling.source_cap)."""
    from shaha_spark.operators.sampling import source_cap

    return source_cap(_t(spark, sf_dir, "documents"), "source", "doc_id", cap=10)


def q_docs_ppl_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail pacing buckets per language by
    unigram log-likelihood (operators.terms.ppl_pacing_buckets)."""
    from shaha_spark.operators.terms import ppl_pacing_buckets

    return ppl_pacing_buckets(_t(spark, sf_dir, "documents"), buckets=3)


def q_events_gapfill(spark, sf_dir):
    """Dense hourly per-type series with zero-fill and
    last-observation-carried-forward (operators.timeseries.gapfill)."""
    from shaha_spark.operators.timeseries import gapfill

    return gapfill(_events(spark, sf_dir))


def q_events_debounce(spark, sf_dir):
    """Consecutive-gap debounce: drop (user, type) repeats within 60 s
    of the previous event (operators.timeseries.debounce)."""
    from shaha_spark.operators.timeseries import debounce

    out = debounce(_events(spark, sf_dir))
    return out.select(
        "event_id", "user_id", "event_type", F.col("tus").alias("ts_us")
    )


def q_users_scd2(spark, sf_dir):
    """SCD2 dimension history of the props.k attribute per user
    (operators.timeseries.scd2_intervals)."""
    from shaha_spark.operators.timeseries import scd2_intervals

    return scd2_intervals(_events(spark, sf_dir))


def q_events_rollup_incremental(spark, sf_dir):
    """Materialized-rollup maintenance proven exact: the events table
    split into three disjoint batches (event_id mod 3), each rolled up
    independently and folded in with two merges — must reproduce the
    oracle's single-pass aggregation bit-for-bit
    (operators.incremental.rollup_increment / merge_rollup)."""
    from shaha_spark.operators.incremental import (
        finalize_rollup,
        merge_rollup,
        rollup_increment,
    )

    ev = _events(spark, sf_dir)
    state = rollup_increment(ev.where(F.col("event_id") % 3 == 0))
    for m in (1, 2):
        state = merge_rollup(
            state, rollup_increment(ev.where(F.col("event_id") % 3 == m))
        )
    return finalize_rollup(state)


def q_emb_ann_recall(spark, sf_dir):
    """Recall@5 of the end-to-end IVF-kmeans ANN against brute-force
    exact top-5 (operators.similarity.topk_recall) — the quality gate
    for the approximate path, with BOTH pipelines inside one
    value-hash comparison."""
    from shaha_spark.operators.kmeans import kmeans_fit
    from shaha_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        topk_recall,
    )

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embs, queries, k=5)
    approx = ivf_topk(embs, queries, kmeans_fit(embs, k=4, iters=2), k=5, nprobe=2)
    return topk_recall(exact, approx, k=5)


def q_events_pit_join(spark, sf_dir):
    """Point-in-time join: odd events pick up the props.k attribute
    valid at their timestamp from the SCD2 history built over the EVEN
    events (operators.joins.point_in_time_join over
    operators.timeseries.scd2_intervals) — the no-future-leakage
    feature-backfill shape."""
    from shaha_spark.operators.joins import point_in_time_join
    from shaha_spark.operators.timeseries import scd2_intervals

    ev = _events(spark, sf_dir)
    dim = scd2_intervals(ev.where(F.col("event_id") % 2 == 0))
    facts = ev.where(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", F.col("tus").alias("ts_us")
    )
    return point_in_time_join(facts, dim, "user_id", "ts_us", ["attr"])


def q_emb_sq_topk(spark, sf_dir):
    """Two-stage scalar-quantized ANN: uint8 ADC candidate top-20
    (exact integer dot of code arrays), exact-cosine re-rank top-5
    (operators.embeddings.sq_topk)."""
    from shaha_spark.operators.embeddings import sq_topk

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq_topk(embs, queries, m=20, k=5)


def q_emb_prefix_topk(spark, sf_dir):
    """Matryoshka-style two-stage ANN: candidate generation on the
    first 8 dimensions, full-64-dim exact re-rank
    (operators.similarity.prefix_topk)."""
    from shaha_spark.operators.similarity import prefix_topk

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return prefix_topk(embs, queries, prefix_dims=8, m=20, k=5)


def q_events_cube(spark, sf_dir):
    """Full CUBE over (hour-of-day, event_type) — the grouping-sets
    surface events_rollup's hierarchy does not cover: the (type-only)
    and (hour-only) marginals come out of the same single Expand +
    hash aggregate."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.hour(F.timestamp_micros(F.col("tus"))).cast("string").alias("hod"),
        "event_type",
        "value",
    )
    return (
        base.cube("hod", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", "decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("hod", F.lit("ALL")).alias("hod"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def q_events_nearest_join(spark, sf_dir):
    """Nearest-purchase attribution for every click: closest purchase
    event either direction within 10 minutes, per user; equal-distance
    ties resolve to the earlier purchase
    (operators.joins.nearest_join — zero-join two-window formulation)."""
    from shaha_spark.operators.joins import nearest_join

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "tus"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "tus"
    )
    return nearest_join(
        left,
        right,
        key_col="user_id",
        time_col="tus",
        tolerance=600_000_000,
        right_value_cols=["event_id"],
        order_col="event_id",
    )


def _scored_with_label(spark, sf_dir):
    """Demo-weight logreg probabilities joined with the lang=='en'
    label — the shared input of the ML-eval registrations."""
    from shaha_spark.operators.classifier import hashed_features, logreg_score

    docs = _t(spark, sf_dir, "documents")
    feats = hashed_features(docs, dim=LOGREG_DIM)
    scored = logreg_score(feats, LOGREG_WEIGHTS, 0.0).select(
        "doc_id", F.round("quality_prob", 6).alias("quality_prob")
    )
    return scored.join(
        docs.select("doc_id", (F.col("lang") == "en").alias("label")),
        "doc_id",
    )


def q_docs_clf_report(spark, sf_dir):
    """Confusion matrix + precision/recall/F1/accuracy of the demo
    classifier against the lang=='en' label at threshold 0.5 — one
    aggregation pass (operators.classifier.classification_report)."""
    from shaha_spark.operators.classifier import classification_report

    return classification_report(
        _scored_with_label(spark, sf_dir), "label", threshold=0.5
    )


def q_docs_calibration(spark, sf_dir):
    """Reliability-diagram table: equal-width probability bins, mean
    predicted probability vs observed positive rate
    (operators.classifier.calibration_bins)."""
    from shaha_spark.operators.classifier import calibration_bins

    return calibration_bins(_scored_with_label(spark, sf_dir), "label")


def q_events_interarrival(spark, sf_dir):
    """Per-user inter-arrival profile: exact median gap (the
    group-quantile recipe) plus decimal-exact mean gap — the
    burstiness readout behind rate limiting and bot screening."""
    from pyspark.sql import Window
    from shaha_spark.operators.profile import group_quantiles

    ev = _events(spark, sf_dir).select("user_id", "event_id", "tus")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gaps = ev.withColumn("gap", F.col("tus") - F.lag("tus").over(w)).where(
        F.col("gap").isNotNull()
    )
    med = group_quantiles(gaps, "user_id", "gap", [0.5]).select(
        "user_id", F.col("p50").alias("median_gap_us")
    )
    means = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(
            F.sum(F.col("gap").cast("decimal(20,0)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_gap_us"),
    )
    return means.join(med, "user_id")


def q_docs_overview(spark, sf_dir):
    """One-row corpus dashboard: doc/lang/source counts, decimal-exact
    mean length, and the exact-duplicate fraction (docs whose text
    appears more than once) — the front-page health panel every
    curation run prints first."""
    docs = _t(spark, sf_dir, "documents")
    dup_docs = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__dups"))
    )
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_chars"),
    )
    return base.crossJoin(F.broadcast(dup_docs)).select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("n_sources").cast("bigint").alias("n_sources"),
        "mean_chars",
        F.col("__dups").cast("bigint").alias("n_dup_docs"),
        F.round(
            F.col("__dups").cast("double") / F.col("n_docs").cast("double"), 9
        ).alias("dup_fraction"),
    )


def q_dq_functional(spark, sf_dir):
    """Functional-dependency probe — does A determine B? — for three
    candidate dependencies across TPC-H: one row each with the count
    of A-values mapping to >1 distinct B (violations = 0 proves the
    dependency holds on this data). The DQ companion of
    dq_referential: FDs catch denormalization drift joins can't."""
    def probe(name, df, a, b):
        per = df.groupBy(a).agg(F.count_distinct(b).alias("__k"))
        return per.agg(
            F.lit(name).alias("dependency"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("__k") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    a = probe("o_orderkey->o_custkey", orders, "o_orderkey", "o_custkey")
    b = probe("l_orderkey->l_returnflag", li, "l_orderkey", "l_returnflag")
    c = probe("c_custkey->c_nationkey", cust, "c_custkey", "c_nationkey")
    return a.unionByName(b).unionByName(c)


def q_events_value_percentile(spark, sf_dir):
    """Exact quantile normalization: each event's value mapped to its
    empirical CDF position within its event type —
    cume = (#rows with value ≤ v) / n, computed as the max row_number
    per (type, value) so ties share one exact position. The
    feature-engineering step that makes heavy-tailed values
    model-comparable."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    ties_max = ranked.groupBy("event_type", "value").agg(
        F.max("__rn").alias("__tie_max")
    )
    return (
        ranked.join(ties_max, ["event_type", "value"])
        .select(
            "event_type",
            "event_id",
            "value",
            F.round(
                F.col("__tie_max").cast("double") / F.col("__n").cast("double"),
                9,
            ).alias("cume"),
        )
    )


def q_events_audience_overlap(spark, sf_dir):
    """Day-over-day audience overlap: Jaccard of consecutive days'
    active-user sets — the churn-adjacent stability metric. One
    distinct (day, user) projection, an adjacent-day equi-join
    (day = day+1, never a range join), integer-exact overlap counts."""
    ev = _events(spark, sf_dir).select(
        (F.col("tus") / F.lit(86_400_000_000)).cast("long").alias("day"),
        "user_id",
    ).distinct()
    per_day = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n_users"))
    inter = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.day") == F.col("a.day") + 1),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    da = per_day.select(F.col("day"), F.col("n_users").alias("n_day"))
    db = per_day.select(
        (F.col("day") - 1).alias("day"), F.col("n_users").alias("n_next")
    )
    return (
        da.join(db, "day")
        .join(inter, "day", "left")
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.col("n_day").cast("bigint").alias("n_day"),
            F.col("n_next").cast("bigint").alias("n_next"),
            F.coalesce(F.col("n_both"), F.lit(0)).cast("bigint").alias("n_both"),
            F.round(
                F.coalesce(F.col("n_both"), F.lit(0)).cast("double")
                / (
                    F.col("n_day") + F.col("n_next")
                    - F.coalesce(F.col("n_both"), F.lit(0))
                ).cast("double"),
                9,
            ).alias("jaccard"),
        )
    )


def q_docs_hapax_ratio(spark, sf_dir):
    """Per-document hapax share: the fraction of a doc's tokens that
    are corpus hapax legomena (tf = 1) — high shares flag noise/OCR
    junk, zero shares flag boilerplate; the doc-level companion of
    words_freq_of_freqs. Hapax set joins broadcast (it is
    vocabulary-sized)."""
    words = __import__("__spark_entry__")._words(spark, sf_dir)
    tf = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    hapax = tf.where(F.col("c") == 1).select("word")
    tok = words.select("doc_id", "word")
    flagged = tok.join(
        F.broadcast(hapax.withColumn("__h", F.lit(1))), "word", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.coalesce(F.col("__h"), F.lit(0))).cast("bigint").alias("n_hapax"),
        F.round(
            F.sum(F.coalesce(F.col("__h"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("hapax_ratio"),
    )


def q_emb_silhouette(spark, sf_dir):
    """Simplified silhouette per k-means cluster (distances to
    centroids, not pairwise — the O(n·k) variant that scales):
    s = (b − a)/max(a, b) with a = cosine distance to own centroid,
    b = min distance to any other; per-point terms rounded 9 and
    decimal-summed into per-cluster means."""
    from shaha_spark.operators.kmeans import kmeans_fit
    from shaha_spark.operators.similarity import cosine_sim, ivf_assign

    embs = _t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(embs, k=4, iters=2).localCheckpoint(eager=True)
    assigned = ivf_assign(embs, cents)
    dists = assigned.crossJoin(
        F.broadcast(
            cents.select(
                F.col("centroid_id").alias("cid"), F.col("centroid")
            )
        )
    ).select(
        "vec_id",
        "centroid_id",
        "cid",
        (
            F.lit(1.0) - F.round(cosine_sim(F.col("embedding"), F.col("centroid")), 6)
        ).alias("d"),
    )
    per_point = dists.groupBy("vec_id", "centroid_id").agg(
        F.max(F.when(F.col("cid") == F.col("centroid_id"), F.col("d"))).alias(
            "a"
        ),
        F.min(F.when(F.col("cid") != F.col("centroid_id"), F.col("d"))).alias(
            "b"
        ),
    )
    s = F.round(
        (F.col("b") - F.col("a")) / F.greatest("a", "b"), 9
    ).cast("decimal(19,9)")
    return (
        per_point.withColumn("__s", s)
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(
                F.sum("__s").cast("double") / F.count(F.lit(1)), 9
            ).alias("mean_silhouette"),
        )
        .select(
            F.col("centroid_id").cast("bigint").alias("centroid_id"),
            "n_points",
            "mean_silhouette",
        )
    )


def q_docs_freshness(spark, sf_dir):
    """Per-source freshness lag: newest doc per source vs the corpus
    maximum (by doc_id as the monotone ingest marker) plus doc counts
    — the ingest-health report every multi-source pipeline watches."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("doc_id").alias("newest_id"),
    )
    mx = per.agg(F.max("newest_id").alias("__gmax"))
    return per.crossJoin(F.broadcast(mx)).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("newest_id").cast("bigint").alias("newest_id"),
        (F.col("__gmax") - F.col("newest_id")).cast("bigint").alias("lag"),
    )


def q_events_streaks(spark, sf_dir):
    """Longest same-type streak per user (gaps-and-islands on VALUE
    change, the complement of gap sessionization): a new island opens
    when the type differs from the previous event; islands number by
    a running sum over the same per-user sort as sessionize."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "tus", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    is_new = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = ev.withColumn(
        "__run",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_run = runs.groupBy("user_id", "event_type", "__run").agg(
        F.count(F.lit(1)).alias("len")
    )
    wpick = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("event_type").desc()
    )
    return (
        per_run.withColumn("__r", F.row_number().over(wpick))
        .where(F.col("__r") == 1)
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("longest_streak"),
            F.col("event_type").alias("streak_type"),
        )
    )


def q_events_benford(spark, sf_dir):
    """First-significant-digit distribution of |value| vs Benford's
    law — the fraud/synthetic-data screen: observed share, expected
    log10(1+1/d) share, and the per-digit chi-square contribution
    (rounded + decimal-summable)."""
    # values carry 2 decimals: scale to exact integer cents, then the
    # first significant digit is a pure string op — no log10/floor at
    # power-of-ten boundaries, no format quirks, trivially mirrorable
    ev = _events(spark, sf_dir).select(
        F.round(F.abs(F.col("value")) * 100).cast("bigint").alias("cents")
    )
    digits = ev.where(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    total = counts.agg(F.sum("n_obs").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("digit").cast("bigint").alias("digit"),
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.round(
                F.col("n_obs").cast("double") / F.col("__t").cast("double"), 9
            ).alias("observed_share"),
            F.round(
                F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 9
            ).alias("benford_share"),
        )
    )


def q_words_freq_of_freqs(spark, sf_dir):
    """Frequency-of-frequencies over the vocabulary (how many words
    occur exactly c times) — the Good-Turing smoothing input and the
    standard vocabulary-health profile. Two hash-aggs, nothing else."""
    words = __import__("__spark_entry__")._words(spark, sf_dir)
    tf = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words")
    ).select(F.col("c").cast("bigint").alias("c"), "n_words")


def q_words_collocations(spark, sf_dir):
    """Top-25 collocations by PMI over adjacent word bigrams (min
    count 5): ln(N·c(ab)/(c(a)·c(b))) with the rounded-ln recipe —
    the phrase-extraction staple (char-pair BPE counts live in
    docs_bpe_pairs; this is the WORD-level statistical test)."""
    from pyspark.sql import Window

    words = __import__("__spark_entry__")._words(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "w1"),
        )
        .filter(F.col("w1") != "")
    )
    bi = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    uni = words.groupBy(F.col("word")).agg(F.count(F.lit(1)).alias("c"))
    n_tok = words.agg(F.count(F.lit(1)).alias("__n"))
    ua = uni.select(F.col("word").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("word").alias("w2"), F.col("c").alias("c_b"))
    scored = (
        bi.where(F.col("c_ab") >= 5)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.round(
                F.log(
                    (F.col("__n").cast("double") * F.col("c_ab"))
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(25)


def q_events_cohort_value(spark, sf_dir):
    """Cohort LTV curve: cumulative per-user value by cohort day and
    day offset — the revenue companion of events_retention (which
    counts users; this accumulates value). Decimal-exact event sums;
    the only windows run over the (cohort × offset) table, which is
    calendar², never the data."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id",
        (F.col("tus") / F.lit(86_400_000_000)).cast("long").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cell = (
        ev.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(
            F.sum("v").alias("__s"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cell.select(
        "cohort_day",
        "day_offset",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("__s").cast("double").alias("period_value"),
        F.sum("__s").over(w).cast("double").alias("cum_value"),
    )


def q_users_survival(spark, sf_dir):
    """Kaplan-Meier time-to-churn: per-user observation span as the
    duration, an 'error' event as the churn signal, other users
    right-censored (operators.timeseries.kaplan_meier)."""
    from shaha_spark.operators.timeseries import kaplan_meier

    per_user = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            (F.max("tus") - F.min("tus")).alias("dur"),
            F.max(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("ev"),
        )
    )
    return kaplan_meier(per_user, "dur", "ev")


def q_docs_rank_fusion(spark, sf_dir):
    """Reciprocal Rank Fusion of the BM25 keyword ranking with a
    second ranking signal (document length standing in for the
    popularity/recency list a production hybrid fuses) — top-20 by
    RRF score (operators.similarity.rank_fusion)."""
    from pyspark.sql import Window
    from shaha_spark.operators.similarity import rank_fusion
    from shaha_spark.operators.terms import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    bm = bm25_scores(docs, ["scan", "join", "window"])
    wa = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    ra = bm.select(
        "doc_id", F.row_number().over(wa).alias("rank")
    ).where(F.col("rank") <= 50)
    wb = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    rb = docs.select(
        "doc_id", F.row_number().over(wb).alias("rank")
    ).where(F.col("rank") <= 50)
    return rank_fusion(ra, rb, "doc_id", k=60, top=20)


def q_orders_kcore(spark, sf_dir):
    """3-core of the part co-purchase graph — iterative peeling whose
    iteration count is data-dependent (no fixed CTE chain expresses
    it): a DOCUMENTED rows-only registration; the invariant pair
    (every survivor has ≥k surviving neighbors, every dropped node
    would not) is asserted in tests (operators.graph.k_core)."""
    from shaha_spark.operators.basket import pair_counts
    from shaha_spark.operators.graph import k_core

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = pair_counts(li, "l_orderkey", "l_partkey").where(
        F.col("n_pair") >= 2
    )
    return k_core(edges, k=3, src="item_a", dst="item_b")


def q_events_active_time(spark, sf_dir):
    """Per-user active time: every event opens a 30-minute activity
    interval; overlaps merge so coverage never double-counts
    (operators.timeseries.interval_union_length)."""
    from shaha_spark.operators.timeseries import interval_union_length

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.col("tus").alias("start_us"),
        (F.col("tus") + F.lit(1_800_000_000)).alias("end_us"),
    )
    return interval_union_length(ev, "user_id", "start_us", "end_us")


def q_dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-size histogram — the corpus-health readout of
    the transitive MinHash dedup (how much of the corpus sits in
    2-clusters vs mega-clusters): connected components of the
    est-Jaccard ≥ 0.7 graph, sizes, then (size → n_clusters)."""
    from shaha_spark.operators.components import connected_components
    from shaha_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_similarity,
    )

    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs).cache()
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    edges = (
        minhash_similarity(sigs, pairs, "doc_id")
        .where(F.col("est_jaccard") >= 0.7)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges)
    sizes = comps.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    ).select(F.col("cluster_size").cast("bigint").alias("cluster_size"),
             "n_clusters")


def q_lineitem_weighted_median(spark, sf_dir):
    """Quantity-weighted median price per return flag — exact type-1
    weighted quantile with decimal-exact cumulative weights
    (operators.profile.weighted_quantile)."""
    from shaha_spark.operators.profile import weighted_quantile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return weighted_quantile(
        li, "l_returnflag", "l_extendedprice", "l_quantity", 0.5
    )


def q_events_session_paths(spark, sf_dir):
    """Top-25 full session journeys ('signup>click>...') by frequency —
    the path-analysis staple funnel/transitions don't give (those
    score STEPS; this ranks complete ordered paths). Per-session
    collect is bounded by session length; the count agg shuffles path
    strings."""
    from pyspark.sql import Window
    from __spark_entry__ import SESSION_GAP_US

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "tus", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("tus", "event_id", "event_type"))
                ),
                lambda s: s.getField("event_type"),
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(25)
    )


def q_events_mean_shift(spark, sf_dir):
    """Two-window mean-shift change points per event type (2 h frames,
    ≥3 points each side, |shift| > 10)
    (operators.timeseries.mean_shift_points)."""
    from shaha_spark.operators.timeseries import mean_shift_points

    ev = _events(spark, sf_dir).select("event_type", "tus", "value")
    return mean_shift_points(
        ev, "event_type", "tus", "value",
        window_us=7_200_000_000, min_points=3, threshold=10.0,
    )


def q_events_chi_square(spark, sf_dir):
    """Chi-square independence of (event_type × hash-split cohort) —
    the categorical companion of the Welch readout
    (operators.profile.chi_square)."""
    from shaha_spark.operators.profile import chi_square

    ev = _events(spark, sf_dir).select(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    )
    return chi_square(ev, "event_type", "cohort")


def q_events_key_skew(spark, sf_dir):
    """Sort-free key-skew report over user_id — the shuffle-planning
    health check (operators.profile.key_skew_report); HHI and
    max-share from exact integer aggregates, never a prefix-sum
    window."""
    from shaha_spark.operators.profile import key_skew_report

    return key_skew_report(
        _events(spark, sf_dir).select("user_id"), "user_id", top=5
    ).select(
        "n_rows", "n_keys", "max_count", "max_share", "hhi",
        F.array_join(
            F.transform(
                "topk_shares",
                lambda x: x.cast("decimal(12,9)").cast("string"),
            ),
            ",",
        ).alias("topk_shares_str"),
    )


def q_events_mad_outliers(spark, sf_dir):
    """Robust per-type outliers: |x − median| > 3·MAD — the screen
    that still works when outliers inflate mean and stddev
    (operators.profile.mad_outliers)."""
    from shaha_spark.operators.profile import mad_outliers

    return mad_outliers(
        _events(spark, sf_dir).select("event_type", "event_id", "value"),
        "event_type",
        "value",
        "event_id",
    )


def q_orders_set_similarity(spark, sf_dir):
    """Set-similarity self-join over order part-sets (Jaccard ≥ 0.5)
    with exact-recall prefix filtering
    (operators.basket.set_similarity_join); the oracle generates
    candidates exhaustively from ANY shared item and must produce the
    identical verified pair set — proving the prefix filter loses
    nothing."""
    from shaha_spark.operators.basket import set_similarity_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return set_similarity_join(li, "l_orderkey", "l_partkey", threshold=0.5)


def q_words_trigram_fuzzy(spark, sf_dir):
    """Trigram-posting-blocked fuzzy pairs over the vocabulary
    (operators.dedup.trigram_fuzzy_pairs) — the scalable blocking
    complement to the exhaustive length-band levenshtein_pairs."""
    from __spark_entry__ import _dwords
    from shaha_spark.operators.dedup import trigram_fuzzy_pairs

    return trigram_fuzzy_pairs(_dwords(spark, sf_dir), "word", max_dist=2)


def q_emb_ivf_index_topk(spark, sf_dir):
    """Persistent-index ANN round trip: fit + assign + WRITE the
    corpus partitionBy(centroid_id), then probe through the
    partition-pruned scan (operators.ann_index). Must hash-match the
    same chained kmeans→IVF oracle as the in-plan operator — proving
    the disk round trip changes nothing but the scan shape."""
    import tempfile

    from shaha_spark.operators.ann_index import build_ivf_index, ivf_index_topk

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = tempfile.mkdtemp(prefix="shaha_ivfidx_") + "/ivf"
    build_ivf_index(embs, path, k=4, iters=2)
    return ivf_index_topk(
        spark, path, queries, nprobe=2, k_neighbors=5
    ).select(
        "query_id",
        "vec_id",
        F.col("approx_cosine").alias("cosine"),
        "rank",
    )


def q_orders_pair_triangles(spark, sf_dir):
    """Triangle count of the part co-purchase graph (edges = basket
    pairs with support >= 2) via degree-oriented wedge enumeration
    (operators.graph.triangle_count); the oracle counts the same
    triangles with the independent a<b<c three-way join."""
    from shaha_spark.operators.basket import pair_counts
    from shaha_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = pair_counts(li, "l_orderkey", "l_partkey").where(
        F.col("n_pair") >= 2
    )
    return triangle_count(edges, "item_a", "item_b")


def q_events_ab_welch(spark, sf_dir):
    """A/B experiment readout: Welch's t between the two deterministic
    hash-split user cohorts over event value
    (operators.profile.welch_t)."""
    from shaha_spark.operators.profile import welch_t

    ev = _events(spark, sf_dir).select(
        (F.col("user_id") % 2).alias("cohort"), "value"
    )
    return welch_t(ev, "cohort", "value", 0, 1)


def q_docs_psi_drift(spark, sf_dir):
    """Distribution-drift monitor: PSI of document length between the
    English slice and the rest of the corpus
    (operators.profile.psi)."""
    from shaha_spark.operators.profile import psi

    docs = _t(spark, sf_dir, "documents")
    return psi(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        "n_chars",
    )


def q_docs_auc(spark, sf_dir):
    """Exact ROC-AUC of the demo classifier against the lang=='en'
    label — rank-sum over DISTINCT-SCORE buckets so the only global
    window is bucket-table-sized (operators.classifier.roc_auc)."""
    from shaha_spark.operators.classifier import roc_auc

    return roc_auc(_scored_with_label(spark, sf_dir), "label")


def q_snapshot_row_diff(spark, sf_dir):
    """Row-level change data feed between two snapshots: the appended
    odd-doc vocabulary must surface as exactly the insert set
    (pipeline/snapshot.snapshot_row_diff over the same build → snap →
    append → snap round trip as snapshot_time_travel)."""
    import tempfile

    from shaha_spark.pipeline import snapshot as snap
    from shaha_spark.pipeline.build import build
    from __spark_entry__ import _words

    words = _words(spark, sf_dir)
    even = words.filter(F.col("doc_id") % 2 == 0).select("word").distinct()
    odd = words.filter(F.col("doc_id") % 2 == 1).select("word").distinct()
    # batch 2 carries genuinely-new rows (prefixed odd vocab — the
    # fixture's raw odd vocab fully overlaps the even one, which would
    # make the diff vacuously empty) PLUS the full overlapping even
    # vocab, which the diff must exclude
    batch2 = odd.select(
        F.concat(F.lit("v2-"), F.col("word")).alias("word")
    ).unionByName(even)
    out = tempfile.mkdtemp(prefix="shaha_snapd_") + "/db"
    build(spark, even, ["sha256"], out, source_name="even")
    snap.snapshot_create(spark, out)
    build(spark, batch2, ["sha256"], out, append=True, source_name="v2")
    snap.snapshot_create(spark, out)
    return snap.snapshot_row_diff(
        spark, out, 1, 2, ["preimage", "algorithm"]
    )


def q_dq_referential(spark, sf_dir):
    """Foreign-key orphan report across the TPC-H core relations —
    the cross-table half of the DQ gate (dq_lineitem covers
    single-table rules; operators.checks.referential_check)."""
    from shaha_spark.operators.checks import referential_check

    return referential_check(
        [
            (
                "orders->customer",
                _t(spark, sf_dir, "orders"), "o_custkey",
                _t(spark, sf_dir, "customer"), "c_custkey",
            ),
            (
                "lineitem->orders",
                _t(spark, sf_dir, "lineitem"), "l_orderkey",
                _t(spark, sf_dir, "orders"), "o_orderkey",
            ),
            (
                "lineitem->part",
                _t(spark, sf_dir, "lineitem"), "l_partkey",
                _t(spark, sf_dir, "part"), "p_partkey",
            ),
            (
                "lineitem->supplier",
                _t(spark, sf_dir, "lineitem"), "l_suppkey",
                _t(spark, sf_dir, "supplier"), "s_suppkey",
            ),
        ]
    )


def q_docs_bm25(spark, sf_dir):
    """Okapi BM25 keyword relevance ('scan join window' query) over
    the corpus (operators.terms.bm25_scores) — rounded-ln idf,
    decimal-exact contribution sums."""
    from shaha_spark.operators.terms import bm25_scores

    return bm25_scores(
        _t(spark, sf_dir, "documents"), ["scan", "join", "window"]
    )


def q_events_cumulative_users(spark, sf_dir):
    """Running distinct-user count by day WITHOUT an expanding-window
    distinct: each user counts once at their first day, and the
    running total is a prefix sum over the calendar-sized day table
    (operators.timeseries.cumulative_distinct)."""
    from shaha_spark.operators.timeseries import cumulative_distinct

    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format(F.timestamp_micros(F.col("tus")), "yyyy-MM-dd")
    )
    return cumulative_distinct(ev, "user_id", "day")


def q_orders_basket_rules(spark, sf_dir):
    """Market-basket association pairs over lineitem (order = basket,
    part = item): top-20 by lift with support/confidence — bounded
    in-basket pair expansion, never a self-join
    (operators.basket.basket_rules)."""
    from shaha_spark.operators.basket import basket_rules

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return basket_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2, top=20
    )


def q_multimodal_dedup(spark, sf_dir):
    """Exact binary dedup of media payloads by sha256-digest grouping
    (operators.multimodal.dedup_media); the oracle groups on payload
    equality directly — identical classes, digest-free output."""
    from shaha_spark.operators.multimodal import (
        dedup_media,
        media_from_documents,
    )

    return dedup_media(media_from_documents(_t(spark, sf_dir, "documents")))


def q_emb_prefix_ndcg(spark, sf_dir):
    """Rank-quality (harmonic-discount nDCG@5) of the Matryoshka
    prefix pipeline run LOSSY (candidate m=5 — no re-rank slack)
    against exact top-5: both search pipelines AND the metric inside
    one value-hash comparison (operators.similarity.ndcg_at_k)."""
    from shaha_spark.operators.similarity import (
        brute_force_topk,
        ndcg_at_k,
        prefix_topk,
    )

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embs, queries, k=5)
    approx = prefix_topk(embs, queries, prefix_dims=8, m=5, k=5)
    return ndcg_at_k(exact, approx, k=5)


def q_snapshot_time_travel(spark, sf_dir):
    """Pipeline round trip through the snapshot layer: build the
    even-doc vocabulary, snapshot v1, append the odd-doc vocabulary,
    then TIME-TRAVEL back to v1 — the result must be exactly the
    even-doc build (pipeline/snapshot.py read_snapshot; the append's
    directory swap retires v1's files by rename)."""
    import tempfile

    from shaha_spark.pipeline import snapshot as snap
    from shaha_spark.pipeline.build import build
    from __spark_entry__ import _hex, _words

    words = _words(spark, sf_dir)
    even = words.filter(F.col("doc_id") % 2 == 0).select("word").distinct()
    odd = words.filter(F.col("doc_id") % 2 == 1).select("word").distinct()
    out = tempfile.mkdtemp(prefix="shaha_snapq_") + "/db"
    build(spark, even, ["sha256"], out, source_name="even")
    snap.snapshot_create(spark, out)
    build(spark, odd, ["sha256"], out, append=True, source_name="odd")
    return snap.read_snapshot(spark, out, 1).select(
        _hex(), F.col("preimage"), F.col("algorithm")
    )


def q_events_cdc_snapshot(spark, sf_dir):
    """CDC changelog -> current snapshot (MERGE compaction): per user
    the latest event wins; 'error' acts as the delete operation and
    removes the key (operators.timeseries.cdc_apply)."""
    from shaha_spark.operators.timeseries import cdc_apply

    ev = _events(spark, sf_dir)
    changelog = ev.select(
        "user_id",
        "tus",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        "value",
    )
    return cdc_apply(
        changelog,
        key_cols=["user_id"],
        ts_col="tus",
        op_col="op",
        value_cols=["value"],
        tie_col="event_id",
    )


def queries_r4() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "emb_sq_topk": q_emb_sq_topk,
        "emb_prefix_topk": q_emb_prefix_topk,
        "events_cube": q_events_cube,
        "events_nearest_join": q_events_nearest_join,
        "events_cdc_snapshot": q_events_cdc_snapshot,
        "emb_prefix_ndcg": q_emb_prefix_ndcg,
        "snapshot_time_travel": q_snapshot_time_travel,
        "multimodal_dedup": q_multimodal_dedup,
        "events_cumulative_users": q_events_cumulative_users,
        "orders_basket_rules": q_orders_basket_rules,
        "docs_bm25": q_docs_bm25,
        "dq_referential": q_dq_referential,
        "snapshot_row_diff": q_snapshot_row_diff,
        "docs_clf_report": q_docs_clf_report,
        "docs_calibration": q_docs_calibration,
        "docs_auc": q_docs_auc,
        "events_interarrival": q_events_interarrival,
        "docs_overview": q_docs_overview,
        "dq_functional": q_dq_functional,
        "events_value_percentile": q_events_value_percentile,
        "events_audience_overlap": q_events_audience_overlap,
        "docs_hapax_ratio": q_docs_hapax_ratio,
        "emb_silhouette": q_emb_silhouette,
        "docs_freshness": q_docs_freshness,
        "events_streaks": q_events_streaks,
        "events_benford": q_events_benford,
        "words_freq_of_freqs": q_words_freq_of_freqs,
        "words_collocations": q_words_collocations,
        "events_cohort_value": q_events_cohort_value,
        "users_survival": q_users_survival,
        "docs_rank_fusion": q_docs_rank_fusion,
        "orders_kcore": q_orders_kcore,
        "events_active_time": q_events_active_time,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "lineitem_weighted_median": q_lineitem_weighted_median,
        "events_session_paths": q_events_session_paths,
        "events_mean_shift": q_events_mean_shift,
        "events_chi_square": q_events_chi_square,
        "events_key_skew": q_events_key_skew,
        "events_mad_outliers": q_events_mad_outliers,
        "orders_set_similarity": q_orders_set_similarity,
        "words_trigram_fuzzy": q_words_trigram_fuzzy,
        "emb_ivf_index_topk": q_emb_ivf_index_topk,
        "orders_pair_triangles": q_orders_pair_triangles,
        "events_ab_welch": q_events_ab_welch,
        "docs_psi_drift": q_docs_psi_drift,
        "emb_ann_recall": q_emb_ann_recall,
        "events_pit_join": q_events_pit_join,
        "events_rollup_incremental": q_events_rollup_incremental,
        "docs_source_cap": q_docs_source_cap,
        "docs_ppl_buckets": q_docs_ppl_buckets,
        "events_gapfill": q_events_gapfill,
        "events_debounce": q_events_debounce,
        "users_scd2": q_users_scd2,
        "docs_line_dedup": q_docs_line_dedup,
        "docs_dup_span_removed": q_docs_dup_span_removed,
        "docs_temperature_rates": q_docs_temperature_rates,
        "docs_temperature_resample": q_docs_temperature_resample,
        "docs_dsir_weights": q_docs_dsir_weights,
        "docs_dsir_topk": q_docs_dsir_topk,
        "docs_top_keywords": q_docs_top_keywords,
        "docs_redact": q_docs_redact,
        "dedup_keep_best": q_dedup_keep_best,
        "docs_hashed_features": q_docs_hashed_features,
        "docs_logreg_score": q_docs_logreg_score,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "emb_pq_topk": q_emb_pq_topk,
        "emb_ivf_pq_topk": q_emb_ivf_pq_topk,
        "docs_bpe_encode": q_docs_bpe_encode,
        "docs_char_entropy": q_docs_char_entropy,
        "docs_trigram_backoff": q_docs_trigram_backoff,
        "docs_curated": q_docs_curated,
    }


# ------------------------------------------------------------ oracles

_LINES_CTE = """lines AS (
  SELECT doc_id, text AS line FROM documents
),
dupl AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
  ) WHERE nd >= 2
),
ld AS (
  SELECT doc_id, line AS text FROM lines
  WHERE line NOT IN (SELECT line FROM dupl) AND line <> ''
)"""

_TEMP_RATES_CTE = """counts AS (
  SELECT lang AS stratum, count(*) AS n_docs FROM documents GROUP BY lang
),
powed AS (
  SELECT stratum, n_docs,
         pow(n_docs::DOUBLE / sum(n_docs) OVER (), 0.7) AS pa,
         sum(n_docs) OVER () AS n
  FROM counts
),
rates AS (
  SELECT stratum, n_docs,
         least(1.0, n::DOUBLE * (pa / sum(pa) OVER ()) / n_docs::DOUBLE) AS rate
  FROM powed
)"""


def _dsir_weights_sql(num_buckets: int = 4096) -> str:
    return f"""WITH toks AS (
  SELECT doc_id, lang, w, pos FROM (
    SELECT doc_id, lang, unnest(ts) AS w,
           unnest(range(1, len(ts) + 1)) AS pos
    FROM (SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), t -> t <> '') AS ts
          FROM documents)
  )
),
withnext AS (
  SELECT doc_id, lang, w,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
grams AS (
  SELECT doc_id, lang, w AS gram FROM withnext
  UNION ALL
  SELECT doc_id, lang, concat(w, ' ', w2) AS gram
  FROM withnext WHERE w2 IS NOT NULL
),
bucketed AS (
  SELECT doc_id, lang,
         {h28_sql("concat(gram, '')")} % {num_buckets} AS bucket
  FROM grams
),
cr AS (SELECT bucket, count(*) AS cr FROM bucketed GROUP BY bucket),
ct AS (SELECT bucket, count(*) AS ct FROM bucketed
       WHERE lang = 'en' GROUP BY bucket),
tr AS (SELECT sum(cr) AS tr FROM cr),
tt AS (SELECT coalesce(sum(ct), 0) AS tt FROM ct),
lam AS (
  SELECT cr.bucket,
         CAST(round(ln((coalesce(ct.ct, 0) + 1)::DOUBLE
                      / (tt.tt + {num_buckets})::DOUBLE), 8) AS DECIMAL(20,8))
       - CAST(round(ln((cr.cr + 1)::DOUBLE
                      / (tr.tr + {num_buckets})::DOUBLE), 8) AS DECIMAL(20,8))
         AS lam
  FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket, tr, tt
),
w AS (
  SELECT b.doc_id, count(*) AS n_grams,
         CAST(sum(lam.lam) AS DOUBLE) AS logweight
  FROM bucketed b JOIN lam ON b.bucket = lam.bucket
  GROUP BY b.doc_id
)"""


_GOPHER_STOPS_IN = "(" + ", ".join(
    f"'{w}'" for w in QUALITY_STOPWORDS
) + ")"

_QUALITY_STOPS_LIST = "[" + ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS) + "]"


def oracle_sql_r4() -> dict[str, str]:
    from shaha_spark.operators.sampling import source_cap_sql
    from shaha_spark.operators.incremental import incremental_rollup_sql
    from shaha_spark.operators.timeseries import (
        debounce_sql,
        gapfill_sql,
        scd2_sql,
    )

    sql: dict[str, str] = {}

    sql["docs_source_cap"] = source_cap_sql("documents", "source", "doc_id", 10)

    sql["docs_ppl_buckets"] = f"""WITH {_WORDS_CTE},
toks AS (SELECT doc_id, word AS term FROM words),
lm AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
lp AS (
  SELECT term,
         CAST(ROUND(LN(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)), 8)
              AS DECIMAL(20,8)) AS lp
  FROM lm, (SELECT SUM(tf) AS total FROM lm)
),
score AS (
  SELECT doc_id, CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logprob
  FROM toks JOIN lp USING (term) GROUP BY doc_id
)
SELECT d.doc_id, d.lang, s.avg_logprob,
  ntile(3) OVER (
    PARTITION BY d.lang ORDER BY s.avg_logprob DESC, d.doc_id
  ) AS bucket
FROM documents d JOIN score s USING (doc_id)"""

    from __spark_entry__ import _ivf_kmeans_sql

    exact_topk = """WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(list_cosine_similarity(cv, qv), 6) DESC, vec_id ASC
         ) AS rank
  FROM c, q
)
SELECT query_id, vec_id FROM ranked WHERE rank <= 5"""
    sql["emb_ann_recall"] = f"""WITH exact AS ({exact_topk}),
approx AS ({_ivf_kmeans_sql(k=4, iters=2, nprobe=2, topk=5)})
SELECT e.query_id,
  CAST(count(a.vec_id) AS BIGINT) AS n_hits,
  CAST(count(a.vec_id) AS DOUBLE) / 5.0 AS recall
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id"""

    sql["events_rollup_incremental"] = incremental_rollup_sql("events")

    scd_even = scd2_sql("(SELECT * FROM events WHERE event_id % 2 = 0)")
    sql["events_pit_join"] = f"""WITH scd AS ({scd_even}),
facts AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_id % 2 = 1
)
SELECT f.event_id, f.user_id, f.ts_us,
  s.valid_from_us AS pit_valid_from_us,
  s.attr AS pit_attr
FROM facts f LEFT JOIN scd s
  ON f.user_id = s.user_id
 AND f.ts_us >= s.valid_from_us
 AND (s.valid_to_us IS NULL OR f.ts_us < s.valid_to_us)"""

    sql["events_gapfill"] = gapfill_sql("events")
    sql["events_debounce"] = debounce_sql("events")
    sql["users_scd2"] = scd2_sql("events")

    sql["docs_line_dedup"] = f"""WITH {_LINES_CTE}
SELECT doc_id, text FROM ld"""

    sql["docs_dup_span_removed"] = """WITH toks0 AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
), toks AS (
  SELECT doc_id, unnest(l) AS w, unnest(range(0, len(l))) AS idx FROM toks0
), grams AS (
  SELECT doc_id, idx,
         w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
           || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win AS gram,
         lead(w, 4) OVER win AS last_w
  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY idx)
), occ AS (
  SELECT doc_id, idx, gram FROM grams WHERE last_w IS NOT NULL
), dupg AS (
  SELECT gram FROM (
    SELECT gram, count(*) OVER (PARTITION BY gram) AS df
    FROM (SELECT DISTINCT doc_id, gram FROM occ)
  ) WHERE df >= 2 GROUP BY gram
), covered AS (
  SELECT DISTINCT o.doc_id, o.idx + s.i AS idx
  FROM occ o JOIN dupg USING (gram),
       UNNEST(generate_series(0, 4)) AS s(i)
), kept AS (
  SELECT t.doc_id, t.idx, t.w FROM toks t
  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
  WHERE c.idx IS NULL
), agg AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY idx) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(t.n_tokens, 0) - coalesce(a.n_kept, 0) AS BIGINT)
         AS n_removed
FROM documents d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN tot t USING (doc_id)"""

    sql["docs_temperature_rates"] = f"""WITH {_TEMP_RATES_CTE}
SELECT stratum, n_docs, rate FROM rates"""

    sql["docs_temperature_resample"] = f"""WITH {_TEMP_RATES_CTE},
thr AS (
  SELECT stratum, CAST(floor(rate * 10000) AS BIGINT) AS thr FROM rates
)
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
FROM documents d LEFT JOIN thr t ON d.lang = t.stratum
WHERE {bucket_sql('doc_id', '')} < coalesce(t.thr, 0)"""

    sql["docs_dsir_weights"] = (
        _dsir_weights_sql() + "\nSELECT doc_id, n_grams, logweight FROM w"
    )

    sql["docs_dsir_topk"] = (
        _dsir_weights_sql()
        + "\nSELECT doc_id, n_grams, logweight FROM w"
        + "\nORDER BY logweight DESC, doc_id ASC LIMIT 25"
    )

    sql["docs_top_keywords"] = """WITH words AS (
  SELECT w AS word, doc_id FROM (
    SELECT unnest(string_split(text, ' ')) AS w, doc_id FROM documents
  ) WHERE w <> ''
),
tf AS (SELECT doc_id, word AS term, count(*) AS tf FROM words GROUP BY 1, 2),
tfd AS (
  SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf
),
n AS (SELECT count(*) AS n_docs FROM documents),
ts AS (
  SELECT tfd.doc_id, tfd.term, tfd.tf, tfd.df,
         CAST(tfd.tf AS DOUBLE)
           * (CAST(n.n_docs AS DOUBLE) / CAST(tfd.df AS DOUBLE)) AS weight
  FROM tfd CROSS JOIN n
)
SELECT doc_id, term, tf, df, weight, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY weight DESC, term ASC
  ) AS rank FROM ts
) WHERE rank <= 3"""

    sql["docs_redact"] = """SELECT doc_id,
  regexp_replace(
    regexp_replace(text, '[0-9]+', '<num>', 'g'),
    '[A-Z][A-Z]+', '<shout>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
  CAST(len(regexp_extract_all(
    regexp_replace(text, '[0-9]+', '<num>', 'g'),
    '[A-Z][A-Z]+')) AS BIGINT) AS n_shout
FROM documents"""

    k_perms = len(MINHASH_PERMS)
    match_terms = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END"
        for i in range(k_perms)
    )
    sql["dedup_keep_best"] = f"""WITH RECURSIVE {_pairs_cte()},
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
qbase AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS qt
  FROM documents
),
q AS (
  SELECT doc_id,
    0.4 * least(CAST(len(qt) AS DOUBLE) / 100.0, 1.0)
  + 0.3 * least(
      CASE WHEN len(qt) > 0
        THEN CAST(list_sum(list_transform(qt, w -> length(w))) AS DOUBLE)
             / len(qt) ELSE 0.0 END / 8.0, 1.0)
  + 0.3 * least(
      CASE WHEN len(qt) > 0
        THEN CAST(len(list_filter(qt,
               w -> list_contains({_QUALITY_STOPS_LIST}, w))) AS DOUBLE)
             / len(qt) ELSE 0.0 END / 0.2, 1.0) AS quality
  FROM qbase
),
ranked AS (
  SELECT c.id, row_number() OVER (
    PARTITION BY c.comp ORDER BY q.quality DESC, c.id ASC
  ) AS rk
  FROM comp c JOIN q ON q.doc_id = c.id
),
losers AS (SELECT id AS doc_id FROM ranked WHERE rk > 1)
SELECT d.doc_id FROM documents d LEFT JOIN losers l USING (doc_id)
WHERE l.doc_id IS NULL"""

    feat_cte = f"""words AS (
  SELECT w AS word, doc_id FROM (
    SELECT unnest(string_split(text, ' ')) AS w, doc_id FROM documents
  ) WHERE w <> ''
),
feat AS (
  SELECT doc_id,
         CAST({h28_sql("concat(word, '')")} % {LOGREG_DIM} AS INTEGER) AS idx,
         count(*) AS c
  FROM words GROUP BY 1, 2
),
tot AS (SELECT doc_id, sum(c) AS n FROM feat GROUP BY doc_id),
fv AS (
  SELECT f.doc_id, f.idx,
         CAST(f.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS val
  FROM feat f JOIN tot t USING (doc_id)
)"""

    sql["docs_hashed_features"] = f"""WITH {feat_cte}
SELECT doc_id, idx, val FROM fv"""

    # w_i = ((i*37) % 21 - 10) / 10.0 — exactly LOGREG_WEIGHTS. The
    # ordered sum replays Spark's sequential idx-ordered fold.
    sql["docs_logreg_score"] = f"""WITH {feat_cte},
m AS (
  SELECT doc_id,
         sum(val * ((CAST(idx AS BIGINT) * 37) % 21 - 10) / 10.0
             ORDER BY idx) AS margin
  FROM fv GROUP BY doc_id
)
SELECT d.doc_id,
       round(1.0 / (1.0 + exp(-coalesce(m.margin, 0.0))), 6)
         AS quality_prob
FROM documents d LEFT JOIN m USING (doc_id)"""

    scored_cte = f"""{feat_cte},
m AS (
  SELECT doc_id,
         sum(val * ((CAST(idx AS BIGINT) * 37) % 21 - 10) / 10.0
             ORDER BY idx) AS margin
  FROM fv GROUP BY doc_id
),
scored AS (
  SELECT d.doc_id,
         round(1.0 / (1.0 + exp(-coalesce(m.margin, 0.0))), 6) AS p,
         d.lang = 'en' AS lab
  FROM documents d LEFT JOIN m USING (doc_id)
)"""

    sql["docs_clf_report"] = f"""WITH {scored_cte},
agg AS (
  SELECT SUM(CASE WHEN p >= 0.5 AND lab THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN p >= 0.5 AND NOT lab THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN p < 0.5 AND lab THEN 1 ELSE 0 END) AS fn,
         SUM(CASE WHEN p < 0.5 AND NOT lab THEN 1 ELSE 0 END) AS tn
  FROM scored
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
  CASE WHEN tp + fp = 0 THEN 0.0
       ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 9) END AS precision,
  CASE WHEN tp + fn = 0 THEN 0.0
       ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 9) END AS recall,
  CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
       ELSE round(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE), 9) END AS f1,
  CASE WHEN tp + fp + fn + tn = 0 THEN 0.0
       ELSE round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 9) END AS accuracy
FROM agg"""

    sql["docs_calibration"] = f"""WITH {scored_cte},
binned AS (
  SELECT p, lab, LEAST(9, CAST(FLOOR(p * 10.0) AS INTEGER)) AS bin FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
  round(CAST(SUM(CAST(round(p, 6) AS DECIMAL(16,6))) AS DOUBLE) / COUNT(*), 9) AS mean_prob,
  round(SUM(CASE WHEN lab THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 9) AS pos_rate
FROM binned GROUP BY bin"""

    sql["events_interarrival"] = """WITH g AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
),
gaps AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
r AS (
  SELECT user_id, CAST(gap AS DOUBLE) AS v,
    row_number() OVER (PARTITION BY user_id ORDER BY gap) - 1 AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM gaps
),
med AS (
  SELECT user_id,
    max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN v END)
    + (max(CASE WHEN rn = CAST(ceil(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN v END)
       - max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN v END))
      * max(CAST(n - 1 AS DOUBLE) * 0.5 - floor(CAST(n - 1 AS DOUBLE) * 0.5)) AS median_gap_us
  FROM r GROUP BY user_id
),
m AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
    round(CAST(SUM(CAST(gap AS DECIMAL(20,0))) AS DOUBLE) / COUNT(*), 9) AS mean_gap_us
  FROM gaps GROUP BY user_id
)
SELECT m.user_id, m.n_gaps, m.mean_gap_us, med.median_gap_us
FROM m JOIN med USING (user_id)"""

    sql["docs_overview"] = """WITH dups AS (
  SELECT COALESCE(SUM(c), 0) AS d FROM (
    SELECT text, COUNT(*) AS c FROM documents GROUP BY text HAVING COUNT(*) > 1
  )
),
base AS (
  SELECT COUNT(*) AS n_docs,
    COUNT(DISTINCT lang) AS n_langs,
    COUNT(DISTINCT source) AS n_sources,
    round(CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 9) AS mean_chars
  FROM documents
)
SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(n_langs AS BIGINT) AS n_langs,
  CAST(n_sources AS BIGINT) AS n_sources, mean_chars,
  CAST(d AS BIGINT) AS n_dup_docs,
  round(CAST(d AS DOUBLE) / CAST(n_docs AS DOUBLE), 9) AS dup_fraction
FROM base CROSS JOIN dups"""

    sql["dq_functional"] = """WITH a AS (
  SELECT 'o_orderkey->o_custkey' AS dependency,
    COUNT(*) AS n_keys,
    SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS n_violations
  FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS k FROM orders GROUP BY 1)
),
b AS (
  SELECT 'l_orderkey->l_returnflag',
    COUNT(*), SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END)
  FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS k FROM lineitem GROUP BY 1)
),
c AS (
  SELECT 'c_custkey->c_nationkey',
    COUNT(*), SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END)
  FROM (SELECT c_custkey, COUNT(DISTINCT c_nationkey) AS k FROM customer GROUP BY 1)
)
SELECT dependency, CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_violations AS BIGINT) AS n_violations
FROM (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c)"""

    sql["events_value_percentile"] = """WITH r AS (
  SELECT event_type, event_id, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
tm AS (
  SELECT event_type, value, MAX(rn) AS tie_max
  FROM r GROUP BY event_type, value
)
SELECT r.event_type, r.event_id, r.value,
  round(CAST(tm.tie_max AS DOUBLE) / CAST(r.n AS DOUBLE), 9) AS cume
FROM r JOIN tm ON r.event_type = tm.event_type AND r.value = tm.value"""

    sql["events_audience_overlap"] = """WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
),
pd AS (SELECT day, COUNT(*) AS n_users FROM du GROUP BY day),
inter AS (
  SELECT a.day AS day, COUNT(*) AS n_both
  FROM du a JOIN du b ON a.user_id = b.user_id AND b.day = a.day + 1
  GROUP BY a.day
)
SELECT CAST(da.day AS BIGINT) AS day,
  CAST(da.n_users AS BIGINT) AS n_day,
  CAST(db.n_users AS BIGINT) AS n_next,
  CAST(COALESCE(i.n_both, 0) AS BIGINT) AS n_both,
  round(CAST(COALESCE(i.n_both, 0) AS DOUBLE)
        / CAST(da.n_users + db.n_users - COALESCE(i.n_both, 0) AS DOUBLE), 9) AS jaccard
FROM pd da
JOIN pd db ON db.day = da.day + 1
LEFT JOIN inter i ON i.day = da.day"""

    sql["docs_hapax_ratio"] = f"""WITH {_WORDS_CTE},
tf AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word),
hap AS (SELECT word FROM tf WHERE c = 1),
tok AS (
  SELECT w.doc_id, w.word, CASE WHEN h.word IS NULL THEN 0 ELSE 1 END AS ih
  FROM words w LEFT JOIN hap h ON w.word = h.word
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(ih) AS BIGINT) AS n_hapax,
  round(CAST(SUM(ih) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS hapax_ratio
FROM tok GROUP BY doc_id"""

    _silh_parts = ",\n".join(_kmeans_parts(k=4, iters=2))
    sql["emb_silhouette"] = f"""WITH {_silh_parts},
af AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(CAST(v.e AS DOUBLE[]), c.cv) DESC,
                      c.centroid_id ASC
           ) AS r
    FROM v CROSS JOIN c2 c
  ) WHERE r = 1
),
dists AS (
  SELECT a.vec_id, a.centroid_id, c.centroid_id AS cid,
    1.0 - round(list_cosine_similarity(CAST(a.e AS DOUBLE[]), c.cv), 6) AS d
  FROM af a CROSS JOIN c2 c
),
pp AS (
  SELECT vec_id, centroid_id,
    MAX(CASE WHEN cid = centroid_id THEN d END) AS a,
    MIN(CASE WHEN cid <> centroid_id THEN d END) AS b
  FROM dists GROUP BY vec_id, centroid_id
),
t AS (
  SELECT centroid_id,
    CAST(round((b - a) / GREATEST(a, b), 9) AS DECIMAL(19,9)) AS s
  FROM pp
)
SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
  CAST(COUNT(*) AS BIGINT) AS n_points,
  round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 9) AS mean_silhouette
FROM t GROUP BY centroid_id"""

    sql["docs_freshness"] = """WITH per AS (
  SELECT source, COUNT(*) AS n_docs, MAX(doc_id) AS newest_id
  FROM documents GROUP BY source
),
mx AS (SELECT MAX(newest_id) AS gmax FROM per)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(newest_id AS BIGINT) AS newest_id,
  CAST(gmax - newest_id AS BIGINT) AS lag
FROM per CROSS JOIN mx"""

    sql["events_streaks"] = """WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
    CASE WHEN lag(event_type) OVER w IS NULL
           OR lag(event_type) OVER w <> event_type
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
runs AS (
  SELECT user_id, event_type,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
  FROM ordered
),
per_run AS (
  SELECT user_id, event_type, r, COUNT(*) AS len
  FROM runs GROUP BY user_id, event_type, r
)
SELECT user_id, CAST(len AS BIGINT) AS longest_streak,
       event_type AS streak_type
FROM (
  SELECT user_id, len, event_type,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY len DESC, event_type DESC) AS rn
  FROM per_run
) WHERE rn = 1"""

    sql["events_benford"] = """WITH c AS (
  SELECT CAST(round(abs(value) * 100) AS BIGINT) AS cents FROM events
),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM c WHERE cents > 0
),
counts AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
t AS (SELECT SUM(n_obs) AS total FROM counts)
SELECT CAST(digit AS BIGINT) AS digit, CAST(n_obs AS BIGINT) AS n_obs,
  round(CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE), 9) AS observed_share,
  round(log10(1.0 + 1.0 / digit), 9) AS benford_share
FROM counts CROSS JOIN t"""

    sql["words_freq_of_freqs"] = f"""WITH {_WORDS_CTE},
tf AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word)
SELECT CAST(c AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS n_words
FROM tf GROUP BY c"""

    sql["words_collocations"] = f"""WITH {_WORDS_CTE},
toks AS (
  SELECT doc_id, w AS w1, p FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS p
    FROM documents
  ) WHERE w <> ''
),
bi AS (
  SELECT w1, w2, COUNT(*) AS c_ab FROM (
    SELECT doc_id, w1, lead(w1) OVER (PARTITION BY doc_id ORDER BY p) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
  GROUP BY w1, w2
),
uni AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word),
nt AS (SELECT COUNT(*) AS n FROM words)
SELECT b.w1, b.w2, CAST(b.c_ab AS BIGINT) AS c_ab,
  round(ln((CAST(nt.n AS DOUBLE) * b.c_ab)
           / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))), 9) AS pmi
FROM bi b
JOIN uni ua ON b.w1 = ua.word
JOIN uni ub ON b.w2 = ub.word
CROSS JOIN nt
WHERE b.c_ab >= 5
ORDER BY pmi DESC, b.w1 ASC, b.w2 ASC
LIMIT 25"""

    sql["events_cohort_value"] = """WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
cell AS (
  SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
         SUM(e.v) AS s, COUNT(DISTINCT e.user_id) AS n_users
  FROM e JOIN c USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_day, day_offset, CAST(n_users AS BIGINT) AS n_users,
  CAST(s AS DOUBLE) AS period_value,
  CAST(SUM(s) OVER (PARTITION BY cohort_day ORDER BY day_offset
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
FROM cell"""

    sql["users_survival"] = """WITH per_user AS (
  SELECT user_id, MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS ev
  FROM events GROUP BY user_id
),
per_t AS (SELECT dur AS t, SUM(ev) AS d, COUNT(*) AS exits FROM per_user GROUP BY dur),
ar AS (
  SELECT t, d, exits,
    SUM(exits) OVER ()
    - COALESCE(SUM(exits) OVER (ORDER BY t
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
  FROM per_t
),
cur AS (
  SELECT t, d, n,
    CASE WHEN d = n THEN 1 ELSE 0 END AS dead,
    CAST(CASE WHEN d < n
      THEN round(ln((CAST(n AS DOUBLE) - d) / CAST(n AS DOUBLE)), 9)
      ELSE 0.0 END AS DECIMAL(19,9)) AS lnf
  FROM ar
),
run AS (
  SELECT t, d, n,
    SUM(lnf) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lns,
    MAX(dead) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS killed
  FROM cur
)
SELECT t, CAST(d AS BIGINT) AS deaths, CAST(n AS BIGINT) AS at_risk,
  CASE WHEN killed = 1 THEN 0.0 ELSE round(exp(CAST(lns AS DOUBLE)), 6) END AS survival
FROM run WHERE d > 0"""

    sql["events_active_time"] = """WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
  FROM events
),
seg AS (
  SELECT user_id, s, e,
    SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END) OVER (
      PARTITION BY user_id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM (
    SELECT user_id, s, e,
      MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
    FROM iv
  )
),
merged AS (
  SELECT user_id, seg, MIN(s) AS ms, MAX(e) AS me, COUNT(*) AS n
  FROM seg GROUP BY user_id, seg
)
SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
  CAST(COUNT(*) AS BIGINT) AS n_merged,
  CAST(SUM(me - ms) AS BIGINT) AS covered_us
FROM merged GROUP BY user_id"""

    from shaha_spark.operators.constants import MINHASH_PERMS as _MP

    _kp = len(_MP)
    _match = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END"
        for i in range(_kp)
    )
    # same recursive-CTE fixpoint as the dedup_minhash_cc oracle, with
    # the histogram tail instead of the survivor anti-join; isolated
    # docs are singleton clusters (size 1) by definition
    sql["dedup_cluster_sizes"] = f"""WITH RECURSIVE {_pairs_cte()},
sims AS (
  SELECT p.id_a, p.id_b,
    CAST({_match} AS DOUBLE) / {_kp} AS est_jaccard
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
sizes AS (SELECT comp, COUNT(*) AS cluster_size FROM comp GROUP BY comp)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size"""

    sql["lineitem_weighted_median"] = """WITH r AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      PARTITION BY l_returnflag
      ORDER BY l_extendedprice, l_quantity
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag, MIN(v) AS wq50,
       CAST(ANY_VALUE(tw) AS DOUBLE) AS total_weight
FROM r WHERE cw >= CAST(0.5 AS DECIMAL(10,6)) * tw
GROUP BY l_returnflag"""

    sql["events_session_paths"] = f"""WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {1_800_000_000}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, tus, event_type,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
),
paths AS (
  SELECT user_id, session_id,
    string_agg(event_type, '>' ORDER BY tus, event_id) AS path
  FROM sess GROUP BY user_id, session_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 25"""

    sql["events_mean_shift"] = """WITH ev AS (
  SELECT event_type, epoch_us(ts) AS tus, CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
f AS (
  SELECT event_type, tus,
    SUM(v) OVER wb AS sb, COUNT(*) OVER wb AS nb,
    SUM(v) OVER wa AS sa, COUNT(*) OVER wa AS na
  FROM ev
  WINDOW wb AS (PARTITION BY event_type ORDER BY tus
                RANGE BETWEEN 7200000000 PRECEDING AND 1 PRECEDING),
         wa AS (PARTITION BY event_type ORDER BY tus
                RANGE BETWEEN CURRENT ROW AND 7199999999 FOLLOWING)
)
SELECT event_type, tus,
  round(CAST(sb AS DOUBLE) / nb, 9) AS mean_before,
  round(CAST(sa AS DOUBLE) / na, 9) AS mean_after,
  round(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb, 9) AS shift
FROM f
WHERE nb >= 3 AND na >= 3
  AND abs(round(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb, 9)) > 10.0"""

    # chi2 via the marginal identity sum(o^2/e) - n (absent cells fold
    # in exactly); per-cell terms rounded 9 + decimal sums
    sql["events_chi_square"] = """WITH ev AS (
  SELECT event_type, user_id % 2 AS cohort FROM events
),
obs AS (SELECT event_type, cohort, COUNT(*) AS o FROM ev GROUP BY 1, 2),
ra AS (SELECT event_type, SUM(o) AS ra FROM obs GROUP BY 1),
cb AS (SELECT cohort, SUM(o) AS cb FROM obs GROUP BY 1),
tot AS (
  SELECT SUM(o) AS n, COUNT(DISTINCT event_type) AS ka,
         COUNT(DISTINCT cohort) AS kb
  FROM obs
),
cells AS (
  SELECT CAST(round(
    (CAST(o AS DOUBLE) * o)
    / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)),
    9) AS DECIMAL(25,9)) AS t, n, ka, kb
  FROM obs JOIN ra USING (event_type) JOIN cb USING (cohort) CROSS JOIN tot
)
SELECT round(CAST(SUM(t) AS DOUBLE) - ANY_VALUE(CAST(n AS DOUBLE)), 9) AS chi2,
  CAST((ANY_VALUE(ka) - 1) * (ANY_VALUE(kb) - 1) AS BIGINT) AS dof,
  CAST(ANY_VALUE(n) AS BIGINT) AS n
FROM cells"""

    sql["events_key_skew"] = """WITH c AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
),
agg AS (SELECT SUM(c) AS n, COUNT(*) AS k, MAX(c) AS mx, SUM(c * c) AS ss FROM c),
t5 AS (SELECT user_id, c FROM c ORDER BY c DESC, user_id ASC LIMIT 5)
SELECT CAST(agg.n AS BIGINT) AS n_rows, CAST(agg.k AS BIGINT) AS n_keys,
  CAST(agg.mx AS BIGINT) AS max_count,
  round(CAST(agg.mx AS DOUBLE) / CAST(agg.n AS DOUBLE), 9) AS max_share,
  round(CAST(agg.ss AS DOUBLE) / (CAST(agg.n AS DOUBLE) * CAST(agg.n AS DOUBLE)), 9) AS hhi,
  (SELECT string_agg(
     CAST(CAST(round(CAST(c AS DOUBLE) / CAST(agg.n AS DOUBLE), 9) AS DECIMAL(12,9)) AS VARCHAR),
     ',' ORDER BY c DESC, user_id ASC)
   FROM t5) AS topk_shares_str
FROM agg"""

    # the same explicit exact-interpolation median recipe as
    # group_quantiles_sql, applied twice (median, then MAD)
    sql["events_mad_outliers"] = """WITH base AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v FROM events
),
r1 AS (
  SELECT event_type, v,
    row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM base
),
med AS (
  SELECT event_type,
    max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN v END)
    + (max(CASE WHEN rn = CAST(ceil(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN v END)
       - max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN v END))
      * max(CAST(n - 1 AS DOUBLE) * 0.5 - floor(CAST(n - 1 AS DOUBLE) * 0.5)) AS med
  FROM r1 GROUP BY event_type
),
dev AS (
  SELECT b.event_type, b.event_id, b.v, m.med, abs(b.v - m.med) AS adev
  FROM base b JOIN med m USING (event_type)
),
r2 AS (
  SELECT event_type, adev,
    row_number() OVER (PARTITION BY event_type ORDER BY adev) - 1 AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
madt AS (
  SELECT event_type,
    max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN adev END)
    + (max(CASE WHEN rn = CAST(ceil(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN adev END)
       - max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN adev END))
      * max(CAST(n - 1 AS DOUBLE) * 0.5 - floor(CAST(n - 1 AS DOUBLE) * 0.5)) AS mad
  FROM r2 GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.v AS value, d.med AS median, t.mad
FROM dev d JOIN madt t USING (event_type)
WHERE d.adev > 3.0 * t.mad"""

    # independent candidate generation (ANY shared item — exhaustive)
    # + the same integer-exact verify: identical final pairs proves the
    # Spark side's prefix filter is exact-recall
    sql["orders_set_similarity"] = """WITH di AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS it FROM lineitem
),
sz AS (SELECT b, COUNT(*) AS n FROM di GROUP BY b),
inter AS (
  SELECT a.b AS basket_a, bb.b AS basket_b, COUNT(*) AS inter
  FROM di a JOIN di bb ON a.it = bb.it AND a.b < bb.b
  GROUP BY 1, 2
)
SELECT i.basket_a, i.basket_b, CAST(i.inter AS BIGINT) AS inter,
  CAST(sa.n + sb.n - i.inter AS BIGINT) AS n_union,
  round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 6) AS jaccard
FROM inter i
JOIN sz sa ON i.basket_a = sa.b
JOIN sz sb ON i.basket_b = sb.b
WHERE CAST(i.inter AS DOUBLE) >= 0.5 * (sa.n + sb.n - i.inter)"""

    from __spark_entry__ import _DWORDS_CTE, _ivf_kmeans_sql

    sql["words_trigram_fuzzy"] = f"""WITH {_DWORDS_CTE},
v AS (SELECT word AS v FROM dwords WHERE len(word) >= 4),
g AS (
  SELECT v, unnest(list_distinct(
    list_transform(range(1, len(v) - 1), i -> v[i:i+2])
  )) AS gm
  FROM v
),
cand AS (
  SELECT a.v AS v_a, b.v AS v_b
  FROM g a JOIN g b USING (gm)
  WHERE a.v < b.v AND abs(len(a.v) - len(b.v)) <= 2
  GROUP BY 1, 2
)
SELECT v_a, v_b, CAST(levenshtein(v_a, v_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(v_a, v_b) <= 2"""

    sql["emb_ivf_index_topk"] = _ivf_kmeans_sql(
        k=4, iters=2, nprobe=2, topk=5
    )

    # independent algorithm as the oracle: canonical a<b<c three-way
    # self-join (the Spark side uses degree-oriented wedges — same
    # triangles, different enumeration, stronger cross-check)
    sql["orders_pair_triangles"] = """WITH di AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pc AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n_pair
  FROM di a JOIN di b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT a, b FROM pc WHERE n_pair >= 2),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (SELECT a AS n FROM e UNION SELECT b FROM e)
SELECT CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges"""

    from shaha_spark.operators.profile import psi_sql, welch_t_sql

    sql["events_ab_welch"] = welch_t_sql(
        "(SELECT user_id % 2 AS cohort, value FROM events)",
        "cohort", "value", "0", "1",
    )
    sql["docs_psi_drift"] = psi_sql(
        "(SELECT * FROM documents WHERE lang = 'en')",
        "(SELECT * FROM documents WHERE lang <> 'en')",
        "n_chars",
    )

    sql["docs_auc"] = f"""WITH {scored_cte},
b AS (
  SELECT p, SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS np,
         SUM(CASE WHEN lab THEN 0 ELSE 1 END) AS nn
  FROM scored GROUP BY p
),
c AS (
  SELECT np, nn,
         SUM(nn) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nn AS below
  FROM b
),
a AS (SELECT SUM(np * (2 * below + nn)) AS num, SUM(np) AS P, SUM(nn) AS N FROM c)
SELECT CASE WHEN P = 0 OR N = 0 THEN 0.0
            ELSE round(CAST(num AS DOUBLE) / (2.0 * P * N), 9) END AS auc,
       CAST(P AS BIGINT) AS n_pos, CAST(N AS BIGINT) AS n_neg
FROM a"""

    kparts = ",\n".join(_kmeans_parts(k=4, iters=2))
    sql["emb_semantic_dedup"] = f"""WITH {kparts},
af AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(CAST(v.e AS DOUBLE[]), c.cv) DESC,
                      c.centroid_id ASC
           ) AS r
    FROM v CROSS JOIN c2 c
  ) WHERE r = 1
),
prs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(
           CAST(a.e AS DOUBLE[]), CAST(b.e AS DOUBLE[])), 6) AS cosine
  FROM af a JOIN af b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
),
losers AS (SELECT DISTINCT id_b AS vec_id FROM prs WHERE cosine >= 0.98)
SELECT e2.vec_id FROM embeddings e2 LEFT JOIN losers l USING (vec_id)
WHERE l.vec_id IS NULL"""

    # PQ: m sub-kmeans chains (namespaced through the parameterized
    # kmeans oracle generator) -> codebook union -> encode (argmax
    # sub-dot, ties centroid-id-asc) -> per-query ADC table -> scored
    # sum -> top-k window. Exposed cosines round to 6 decimals, the
    # cross-engine recipe for float-fold ulp drift.
    dim = 64
    sub_dim = dim // PQ_M
    pq_parts: list[str] = []
    for s in range(PQ_M):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        pq_parts.extend(
            _kmeans_parts(
                k=PQ_K,
                iters=PQ_ITERS,
                prefix=f"s{s}_",
                src=(
                    f"SELECT vec_id, list_slice(embedding, {lo}, {hi}) AS e "
                    "FROM embeddings"
                ),
            )
        )
    pq_parts.append(
        "cb AS ("
        + "\nUNION ALL\n".join(
            f"SELECT {s} AS sub_id, centroid_id, cv FROM s{s}_c{PQ_ITERS}"
            for s in range(PQ_M)
        )
        + ")"
    )
    pq_parts.append(
        """base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
vn AS (SELECT vec_id, sqrt(list_dot_product(ev, ev)) AS vnorm FROM base),
enc AS (
  SELECT vec_id, sub_id, centroid_id AS code FROM (
    SELECT b.vec_id, cb.sub_id, cb.centroid_id,
           row_number() OVER (
             PARTITION BY b.vec_id, cb.sub_id
             ORDER BY list_dot_product(
               list_slice(b.ev, cb.sub_id * {sd} + 1, (cb.sub_id + 1) * {sd}),
               cb.cv) DESC,
             cb.centroid_id ASC
           ) AS r
    FROM base b CROSS JOIN cb
  ) WHERE r = 1
),
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
qn AS (SELECT query_id, sqrt(list_dot_product(qv, qv)) AS qnorm FROM q),
adc AS (
  SELECT q.query_id, cb.sub_id, cb.centroid_id AS code,
         list_dot_product(
           list_slice(q.qv, cb.sub_id * {sd} + 1, (cb.sub_id + 1) * {sd}),
           cb.cv) AS pdot
  FROM q CROSS JOIN cb
),
sc AS (
  SELECT a.query_id, e.vec_id, sum(a.pdot) AS sdot
  FROM enc e JOIN adc a ON e.sub_id = a.sub_id AND e.code = a.code
  GROUP BY 1, 2
),
fin AS (
  SELECT sc.query_id, sc.vec_id, sc.sdot / (qn.qnorm * vn.vnorm) AS ac
  FROM sc JOIN qn USING (query_id) JOIN vn USING (vec_id)
)""".format(sd=sub_dim)
    )
    sql["emb_pq_topk"] = (
        "WITH "
        + ",\n".join(pq_parts)
        + f"""
SELECT query_id, vec_id, round(ac, 6) AS approx_cosine,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY ac DESC, vec_id ASC
  ) AS rank FROM fin
) WHERE rank <= {PQ_TOPK}"""
    )

    sql["docs_trigram_backoff"] = f"""WITH toks AS (
  SELECT doc_id, w, pos FROM (
    SELECT doc_id, unnest(ts) AS w, unnest(range(1, len(ts) + 1)) AS pos
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS ts
          FROM documents)
  )
),
lmdocs AS (
  SELECT doc_id FROM documents WHERE {bucket_sql('doc_id', 'lm')} < 5000
),
scdocs AS (
  SELECT doc_id FROM documents WHERE {bucket_sql('doc_id', 'lm')} >= 5000
),
lmtoks AS (SELECT t.* FROM toks t JOIN lmdocs USING (doc_id)),
c1 AS (SELECT w AS u1, count(*) AS c1 FROM lmtoks GROUP BY 1),
lmwin AS (
  SELECT doc_id, w AS b1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b2
  FROM lmtoks
),
c2 AS (SELECT b1, b2, count(*) AS c2 FROM lmwin
       WHERE b2 IS NOT NULL GROUP BY 1, 2),
lmtri AS (
  SELECT doc_id, w AS w1, lead(w, 1) OVER win AS w2,
         lead(w, 2) OVER win AS w3
  FROM lmtoks WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM lmtri
       WHERE w3 IS NOT NULL GROUP BY 1, 2, 3),
tot AS (SELECT sum(c1) AS n, count(*) AS v FROM c1),
sctoks AS (SELECT t.* FROM toks t JOIN scdocs USING (doc_id)),
occ0 AS (
  SELECT doc_id, w AS w1, lead(w, 1) OVER win AS w2,
         lead(w, 2) OVER win AS w3
  FROM sctoks WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
occ AS (SELECT * FROM occ0 WHERE w3 IS NOT NULL),
keys AS (SELECT DISTINCT w1, w2, w3 FROM occ),
sk AS (
  SELECT k.w1, k.w2, k.w3, c3.c3, ctx.c2 AS c2_ctx, bo.c2 AS c2_bo,
         cw2.c1 AS c1_w2, cw3.c1 AS c1_w3, tot.n, tot.v
  FROM keys k
  LEFT JOIN c3 USING (w1, w2, w3)
  LEFT JOIN c2 ctx ON ctx.b1 = k.w1 AND ctx.b2 = k.w2
  LEFT JOIN c2 bo ON bo.b1 = k.w2 AND bo.b2 = k.w3
  LEFT JOIN c1 cw2 ON cw2.u1 = k.w2
  LEFT JOIN c1 cw3 ON cw3.u1 = k.w3
  CROSS JOIN tot
),
lp AS (
  SELECT w1, w2, w3,
    CAST(round(ln(
      CASE WHEN c3 IS NOT NULL THEN c3::DOUBLE / c2_ctx::DOUBLE
           WHEN c2_bo IS NOT NULL THEN 0.4 * c2_bo::DOUBLE / c1_w2::DOUBLE
           ELSE 0.4 * 0.4 * (coalesce(c1_w3, 0)::DOUBLE + 1.0)
                / (n::DOUBLE + v::DOUBLE) END
    ), 8) AS DECIMAL(20,8)) AS lp
  FROM sk
),
per AS (
  SELECT o.doc_id, count(*) AS n_trigrams,
         CAST(sum(lp.lp) AS DOUBLE) / count(*) AS avg_logprob
  FROM occ o JOIN lp USING (w1, w2, w3) GROUP BY 1
)
SELECT d.doc_id, CAST(coalesce(p.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       p.avg_logprob
FROM scdocs d LEFT JOIN per p USING (doc_id)"""

    sql["docs_char_entropy"] = """WITH pos AS (
  SELECT doc_id, unnest(range(1, length(text) + 1)) AS i FROM documents
),
ch AS (
  SELECT p.doc_id, substr(d.text, p.i, 1) AS c
  FROM pos p JOIN documents d USING (doc_id)
),
cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
tot AS (
  SELECT doc_id, c, n, sum(n) OVER (PARTITION BY doc_id) AS tn FROM cnt
),
terms AS (
  SELECT doc_id, tn,
         CAST(round((n::DOUBLE / tn::DOUBLE)
                    * ln(n::DOUBLE / tn::DOUBLE) / ln(2.0), 8)
              AS DECIMAL(20,8)) AS t
  FROM tot
),
per AS (
  SELECT doc_id, min(tn) AS n_chars, count(*) AS n_distinct_chars,
         -CAST(sum(t) AS DOUBLE) + 0.0 AS entropy
  FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(coalesce(p.n_distinct_chars, 0) AS BIGINT) AS n_distinct_chars,
       coalesce(p.entropy, 0.0) AS entropy
FROM documents d LEFT JOIN per p USING (doc_id)"""

    sql["docs_curated"] = f"""WITH {_LINES_CTE},
w AS (
  SELECT doc_id, w2 AS word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w2 FROM ld
  ) WHERE w2 <> ''
),
gagg AS (
  SELECT doc_id, count(*) AS n_tokens, SUM(len(word)) AS sum_len,
    SUM(CASE WHEN regexp_matches(word, '[a-zA-Z]') THEN 1 ELSE 0 END)
      AS n_alpha,
    SUM(CASE WHEN regexp_matches(word, '[^a-zA-Z0-9]') THEN 1 ELSE 0 END)
      AS n_sym,
    SUM(CASE WHEN word IN {_GOPHER_STOPS_IN} THEN 1 ELSE 0 END) AS n_stop
  FROM w GROUP BY 1
),
gm AS (
  SELECT ld.doc_id,
    coalesce(a.n_tokens, 0) AS n_tokens,
    CASE WHEN coalesce(a.n_tokens, 0) > 0
      THEN CAST(a.sum_len AS DOUBLE) / a.n_tokens ELSE 0.0 END AS mean_len,
    CASE WHEN coalesce(a.n_tokens, 0) > 0
      THEN CAST(a.n_sym AS DOUBLE) / a.n_tokens ELSE 0.0 END AS sym_ratio,
    CASE WHEN coalesce(a.n_tokens, 0) > 0
      THEN CAST(a.n_alpha AS DOUBLE) / a.n_tokens ELSE 0.0 END AS alpha_ratio,
    coalesce(a.n_stop, 0) AS n_stop
  FROM ld LEFT JOIN gagg a USING (doc_id)
),
keepers AS (
  SELECT doc_id FROM gm
  WHERE n_tokens >= 20 AND n_tokens <= 90
    AND mean_len >= 3.0 AND mean_len <= 10.0
    AND sym_ratio <= 0.1 AND alpha_ratio >= 0.8 AND n_stop >= 2
),
g AS (SELECT ld.doc_id, ld.text FROM ld JOIN keepers USING (doc_id)),
ex AS (SELECT md5(text) AS dg, min(doc_id) AS doc_id FROM g GROUP BY 1),
surv AS (SELECT g.doc_id, g.text FROM g JOIN ex ON ex.doc_id = g.doc_id)
SELECT s.doc_id, s.text, d.lang, d.source, d.n_chars
FROM surv s JOIN documents d USING (doc_id)"""

    # ---- two-stage ANN: scalar-quantized ADC + exact re-rank.
    # Codes replay embedding_quantize's proven formula (exact double
    # steps, floor of a correctly-rounded division); the ADC dot is
    # integers-in-double (255^2*64 << 2^53) so CAST to BIGINT is exact.
    sql["emb_sq_topk"] = """WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
x AS (SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS p FROM v),
s AS (SELECT p, CAST(min(x) AS DOUBLE) AS mn, CAST(max(x) AS DOUBLE) AS mx FROM x GROUP BY p),
codes AS (
  SELECT vec_id,
         list(CASE WHEN mx = mn THEN 0
                   ELSE LEAST(255, GREATEST(0, CAST(FLOOR((CAST(x AS DOUBLE) - mn) / (mx - mn) * 256.0) AS INTEGER)))
              END ORDER BY p) AS c
  FROM x JOIN s USING (p) GROUP BY vec_id
),
cc AS (SELECT vec_id, list_transform(c, y -> CAST(y - 128 AS DOUBLE)) AS c FROM codes),
qc AS (SELECT vec_id AS query_id, c FROM cc WHERE vec_id % 100 = 0),
adc AS (
  SELECT qc.query_id, cc.vec_id,
         CAST(list_dot_product(cc.c, qc.c) AS BIGINT) AS adc
  FROM cc CROSS JOIN qc
),
cand AS (
  SELECT query_id, vec_id, adc,
         row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id ASC) AS r
  FROM adc
),
qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id % 100 = 0),
rer AS (
  SELECT cd.query_id, cd.vec_id, cd.adc,
         round(list_cosine_similarity(CAST(v2.embedding AS DOUBLE[]), qv.qv), 6) AS cosine
  FROM cand cd
  JOIN embeddings v2 ON cd.vec_id = v2.vec_id
  JOIN qv ON cd.query_id = qv.query_id
  WHERE cd.r <= 20
),
ranked AS (
  SELECT query_id, vec_id, adc, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rer
)
SELECT query_id, vec_id, adc, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""

    sql["emb_prefix_topk"] = """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_cosine_similarity(cv[1:8], qv[1:8]), 6) AS prefix_cosine
  FROM c CROSS JOIN q
),
cand AS (
  SELECT query_id, vec_id, prefix_cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY prefix_cosine DESC, vec_id ASC) AS r
  FROM scored
),
rer AS (
  SELECT cd.query_id, cd.vec_id, cd.prefix_cosine,
         round(list_cosine_similarity(c.cv, q.qv), 6) AS cosine
  FROM cand cd JOIN c ON cd.vec_id = c.vec_id JOIN q ON cd.query_id = q.query_id
  WHERE cd.r <= 20
),
ranked AS (
  SELECT query_id, vec_id, prefix_cosine, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rer
)
SELECT query_id, vec_id, prefix_cosine, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""

    sql["events_cube"] = """WITH base AS (
  SELECT CAST(hour(ts) AS VARCHAR) AS hod, event_type, value FROM events
)
SELECT coalesce(hod, 'ALL') AS hod, coalesce(event_type, 'ALL') AS event_type,
  count(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM base GROUP BY CUBE (hod, event_type)"""

    # mirrors nearest_join's construction step for step: union-tagged
    # sides, the same (tus, side, ord) total order, backward
    # last(IGNORE NULLS) / forward first(IGNORE NULLS), earlier-wins
    # tie rule, tolerance filter
    sql["events_nearest_join"] = """WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events
),
u AS (
  SELECT user_id, tus, 1 AS side, event_id AS ord, event_id,
         CAST(NULL AS BIGINT) AS r_tus, CAST(NULL AS BIGINT) AS r_event_id
  FROM ev WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, tus, 0 AS side, event_id AS ord, NULL AS event_id,
         tus AS r_tus, event_id AS r_event_id
  FROM ev WHERE event_type = 'purchase'
),
res AS (
  SELECT user_id, tus, side, event_id,
    last_value(r_tus IGNORE NULLS) OVER wpast AS prev_tus,
    last_value(r_event_id IGNORE NULLS) OVER wpast AS prev_id,
    first_value(r_tus IGNORE NULLS) OVER wfut AS next_tus,
    first_value(r_event_id IGNORE NULLS) OVER wfut AS next_id
  FROM u
  WINDOW wpast AS (PARTITION BY user_id ORDER BY tus, side, ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wfut AS (PARTITION BY user_id ORDER BY tus, side, ord
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
sel AS (
  SELECT user_id, event_id, tus,
    CASE WHEN prev_tus IS NOT NULL AND (next_tus IS NULL OR tus - prev_tus <= next_tus - tus)
         THEN prev_tus ELSE next_tus END AS near_tus,
    CASE WHEN prev_tus IS NOT NULL AND (next_tus IS NULL OR tus - prev_tus <= next_tus - tus)
         THEN prev_id ELSE next_id END AS near_event_id,
    CASE WHEN prev_tus IS NOT NULL AND (next_tus IS NULL OR tus - prev_tus <= next_tus - tus)
         THEN tus - prev_tus ELSE next_tus - tus END AS delta
  FROM res WHERE side = 1
)
SELECT user_id, event_id, tus, near_tus, near_event_id, CAST(delta AS BIGINT) AS delta
FROM sel WHERE near_tus IS NOT NULL AND delta <= 600000000"""

    from shaha_spark.operators.similarity import ndcg_ideal

    # exact + lossy-prefix approximate + the metric, one chained oracle;
    # the harmonic discount keeps every term a correctly-rounded
    # small-integer division (no libm), per-term round(.,9) + decimal
    # sums make the score engine-exact, ideal embedded as a literal
    sql["emb_prefix_ndcg"] = f"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id % 100 = 0),
exact AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(cv, qv), 6) DESC, c.vec_id ASC
           ) AS rank
    FROM c CROSS JOIN q
  ) WHERE rank <= 5
),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_cosine_similarity(cv[1:8], qv[1:8]), 6) AS prefix_cosine
  FROM c CROSS JOIN q
),
cand AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY prefix_cosine DESC, vec_id ASC) AS r
  FROM scored
),
rer AS (
  SELECT cd.query_id, cd.vec_id,
         round(list_cosine_similarity(c.cv, q.qv), 6) AS cosine
  FROM cand cd JOIN c ON cd.vec_id = c.vec_id JOIN q ON cd.query_id = q.query_id
  WHERE cd.r <= 5
),
approx AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM rer
  ) WHERE rank <= 5
),
terms AS (
  SELECT a.query_id,
         CAST(round(
           (CASE WHEN e.rank IS NOT NULL THEN 6.0 - e.rank ELSE 0.0 END)
           / (a.rank + 1.0), 9) AS DECIMAL(19,9)) AS term
  FROM approx a LEFT JOIN exact e ON a.query_id = e.query_id AND a.vec_id = e.vec_id
)
SELECT query_id, round(CAST(SUM(term) AS DOUBLE) / {ndcg_ideal(5)!r}, 6) AS ndcg
FROM terms GROUP BY query_id"""

    sql["snapshot_row_diff"] = f"""WITH {_WORDS_CTE},
odd AS (SELECT DISTINCT word FROM words WHERE doc_id % 2 = 1)
SELECT 'v2-' || word AS preimage, 'sha256' AS algorithm, 'insert' AS change
FROM odd"""

    sql["dq_referential"] = """WITH rel AS (
  SELECT 'orders->customer' AS relation,
         (SELECT COUNT(*) FROM orders) AS n_child_rows,
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
  UNION ALL
  SELECT 'lineitem->orders',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem->supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
)
SELECT relation, CAST(n_child_rows AS BIGINT) AS n_child_rows,
       CAST(n_orphans AS BIGINT) AS n_orphans, n_orphans = 0 AS passed
FROM rel"""

    # mirrors bm25_scores shape for shape: one rounded ln per query
    # term, every contribution a correctly-rounded double chain with
    # identical literals, decimal-exact per-doc sums
    sql["docs_bm25"] = f"""WITH {_WORDS_CTE},
toks AS (SELECT doc_id, word AS term FROM words),
nd AS (SELECT COUNT(*) AS n FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
ag AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('scan', 'join', 'window') GROUP BY 1, 2
),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term,
    CAST(round(ln((CAST(n AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0), 8)
         AS DECIMAL(20,8)) AS idf
  FROM dfq CROSS JOIN nd
),
contrib AS (
  SELECT tf.doc_id,
    CAST(round(
      CAST(idf AS DOUBLE) * (CAST(tf AS DOUBLE) * 2.2)
      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))),
      8) AS DECIMAL(20,8)) AS c
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN ag
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched, CAST(SUM(c) AS DOUBLE) AS bm25
FROM contrib GROUP BY doc_id"""

    sql["docs_rank_fusion"] = f"""WITH bm AS (
{sql["docs_bm25"]}
),
ra AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
    FROM bm
  ) WHERE rank <= 50
),
rb AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank
    FROM documents
  ) WHERE rank <= 50
),
t AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
    COALESCE(CAST(round(1.0 / (60.0 + ra.rank), 9) AS DECIMAL(19,9)),
             CAST(0 AS DECIMAL(19,9)))
    + COALESCE(CAST(round(1.0 / (60.0 + rb.rank), 9) AS DECIMAL(19,9)),
               CAST(0 AS DECIMAL(19,9))) AS s
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
)
SELECT doc_id, CAST(s AS DOUBLE) AS rrf_score
FROM t ORDER BY s DESC, doc_id ASC LIMIT 20"""

    sql["events_cumulative_users"] = """WITH firsts AS (
  SELECT user_id, MIN(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS day
  FROM events GROUP BY user_id
),
per AS (SELECT day, COUNT(*) AS new_keys FROM firsts GROUP BY day)
SELECT day, CAST(new_keys AS BIGINT) AS new_keys,
  CAST(SUM(new_keys) OVER (
    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS cum_keys
FROM per"""

    # counts exact integers; support/confidence/lift are single
    # correctly-rounded divisions of products that stay below 2^53 —
    # identical across engines before the round(.,9)
    sql["orders_basket_rules"] = """WITH di AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM di),
ic AS (SELECT l_partkey, COUNT(*) AS ni FROM di GROUP BY l_partkey),
pc AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, COUNT(*) AS n_pair
  FROM di a JOIN di b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT item_a, item_b, CAST(n_pair AS BIGINT) AS n_pair,
  round(n_pair / CAST(nb.n AS DOUBLE), 9) AS support,
  round(n_pair / CAST(ia.ni AS DOUBLE), 9) AS confidence,
  round((CAST(n_pair AS DOUBLE) * CAST(nb.n AS DOUBLE))
        / (CAST(ia.ni AS DOUBLE) * CAST(ib.ni AS DOUBLE)), 9) AS lift
FROM pc
CROSS JOIN nb
JOIN ic ia ON pc.item_a = ia.l_partkey
JOIN ic ib ON pc.item_b = ib.l_partkey
WHERE n_pair >= 2
ORDER BY lift DESC, item_a, item_b
LIMIT 20"""

    sql["multimodal_dedup"] = """WITH media AS (
  SELECT doc_id AS media_id, encode(text) AS payload FROM documents
)
SELECT MIN(media_id) AS keep_id, COUNT(*) AS n_members,
       CAST(octet_length(ANY_VALUE(payload)) AS BIGINT) AS payload_bytes
FROM media GROUP BY payload"""

    sql["snapshot_time_travel"] = f"""WITH {_WORDS_CTE},
even AS (SELECT DISTINCT word FROM words WHERE doc_id % 2 = 0)
SELECT sha256(word) AS hash_hex, word AS preimage, 'sha256' AS algorithm
FROM even"""

    sql["events_cdc_snapshot"] = """WITH ch AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         value
  FROM events
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY tus DESC, event_id DESC) AS rn
  FROM ch
)
SELECT user_id, tus AS last_tus, op AS last_op, value
FROM rn WHERE rn = 1 AND op <> 'delete'"""

    return sql
