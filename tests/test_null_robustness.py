"""NULL/degenerate-input robustness of the statistics operators.

Round-4 review found that several profile/terms operators were only
correct on NULL-free columns (all the shipped testdata): counters
counted NULL rows the paired SUMs skipped, NULL keys fell out of
marginal joins, NULL values ranked into quantiles (NULLS FIRST in
Spark, NULLS LAST in DuckDB — a cross-engine divergence), and an
empty PSI slice was a DIVIDE_BY_ZERO crash under ANSI mode. Each test
here is the minimal reproducer of one of those, pinned to the correct
statistic computed by hand.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_psi_empty_slice_saturates_instead_of_crashing(spark):
    from shaha_spark.operators.profile import psi

    a = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    empty = spark.createDataFrame([], "x double")
    row = psi(a, empty, "x").head()
    # empty side -> all-eps shares -> large positive PSI, never a crash
    assert row.psi is not None and row.psi > 1.0
    assert row.n_a == 10 and row.n_b == 0


def test_chi_square_null_keys_excluded(spark):
    from shaha_spark.operators.profile import chi_square

    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
            (None, "x"), (None, "y")]
    df = spark.createDataFrame(rows, "ca string, cb string")
    r = chi_square(df, "ca", "cb").head()
    # perfectly independent 2x2 table; chi-square is non-negative by
    # definition (the unfiltered version returned -2.0 here)
    assert abs(r.chi2) < 1e-9
    assert r.n == 4 and r.dof == 1


def test_pearson_complete_pairs_only(spark):
    from shaha_spark.operators.profile import pearson_corr

    df = spark.createDataFrame(
        [(1.0, None), (2.0, 2.0), (3.0, 3.0), (None, 4.0), (4.0, 4.0)],
        "x double, y double",
    )
    r = pearson_corr(df, "x", "y").head()
    # the three complete pairs are perfectly correlated
    assert r.n == 3
    assert r.pearson_r == pytest.approx(1.0, abs=1e-12)


def test_histogram_no_phantom_null_spike(spark):
    from shaha_spark.operators.profile import histogram

    df = spark.createDataFrame([(1.0,), (2.0,), (None,), (None,)], "v double")
    rows = histogram(df, "v", bins=4).collect()
    # NULLs must not pile into the top bucket (least() skips NULL)
    assert sum(r.n for r in rows) == 2


def test_group_quantiles_exclude_nulls(spark):
    from shaha_spark.operators.profile import group_quantiles

    df = spark.createDataFrame(
        [("g", None), ("g", 1.0), ("g", 2.0), ("g", 3.0)],
        "g string, v double",
    )
    assert group_quantiles(df, "g", "v", [0.5]).head().p50 == 2.0


def test_zscore_null_rows_do_not_fabricate_variance(spark):
    from shaha_spark.operators.profile import zscore_outliers

    df = spark.createDataFrame(
        [(1, "g", 10.0), (2, "g", 10.0), (3, "g", None)],
        "id long, g string, v double",
    )
    # real sample is {10, 10}: zero variance -> group excluded entirely
    assert zscore_outliers(df, "v", ["g"], "id", z=0.1).count() == 0


def test_welch_t_null_values_not_counted(spark):
    from shaha_spark.operators.profile import welch_t

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", 1.0), ("b", 2.0)],
        "g string, v double",
    )
    r = welch_t(df, "g", "v", "a", "b").head()
    assert r.n_a == 2 and r.n_b == 2
    assert r.mean_a == pytest.approx(1.5) and r.t_stat == pytest.approx(0.0)


def test_winsorize_preserves_null_values(spark):
    from shaha_spark.operators.profile import winsorize

    rows = [(i, "g", float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
    rows.append((9, "g", None))
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r.id: r.value_clipped for r in winsorize(df, "g", "v", "id").collect()}
    # NULL stays NULL instead of snapping to the low clip boundary
    assert out[9] is None
    assert out[4] < 100.0  # the genuine outlier still clips


def test_weighted_quantile_null_value_and_weight_rows_excluded(spark):
    from shaha_spark.operators.profile import weighted_quantile

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
         ("g", None, 5.0), ("g", 0.5, None)],
        "g string, v double, w double",
    )
    r = weighted_quantile(df, "g", "v", "w", q=0.5).head()
    assert r.wq50 == 2.0 and r.total_weight == 3.0


def test_mean_shift_null_values_excluded(spark):
    from shaha_spark.operators.timeseries import mean_shift_points
    import datetime

    base = datetime.datetime(2026, 1, 1)
    rows = []
    for i in range(6):
        rows.append(("k", base + datetime.timedelta(seconds=i), 1.0))
    for i in range(6, 12):
        rows.append(("k", base + datetime.timedelta(seconds=i), 100.0))
    rows.append(("k", base + datetime.timedelta(seconds=3), None))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = mean_shift_points(
        df, "k", "ts", "v", window_us=6_000_000, min_points=3, threshold=10.0
    )
    shifts = {r.mean_before for r in out.collect()}
    # every reported before-mean is a clean mean of non-null values
    assert all(abs(m - 1.0) < 1e-9 or abs(m - 100.0) < 1e-9 or 1.0 < m < 100.0
               for m in shifts)
    assert out.count() > 0


def test_bm25_unmatched_documents_score_zero(spark):
    from shaha_spark.operators.terms import bm25_scores

    df = spark.createDataFrame(
        [(1, "spark scan join"), (2, "completely unrelated text")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bm25_scores(df, ["scan", "join"]).collect()}
    assert set(rows) == {1, 2}
    assert rows[2].n_matched == 0 and rows[2].bm25 == 0.0
    assert rows[1].n_matched == 2 and rows[1].bm25 > 0.0


def test_key_skew_report_is_lazy_single_plan(spark):
    from shaha_spark.operators.profile import key_skew_report

    df = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 2, 3]], "k long")
    out = key_skew_report(df, "k", top=2)
    r = out.head()
    assert (r.n_rows, r.n_keys, r.max_count) == (6, 3, 3)
    assert [round(x, 4) for x in r.topk_shares] == [0.5, 0.3333]


def test_remove_dup_gram_spans_single_corpus_scan(spark, sf_dir):
    from shaha_spark.operators.terms import remove_dup_gram_spans

    from test_plan_lint import _strip_cached_subtrees

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = remove_dup_gram_spans(docs, n=3)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # toks is pinned with a disk-backed persist (r10; was a lazy
    # localCheckpoint, which truncated the render AND ran the explode
    # at construction under AQE): the cached child plan re-renders
    # under every InMemoryTableScan consumer but computes ONCE, so
    # count scans the way the rescan lint does — cached subtrees
    # excised. Was 5 independent scans before round 4.
    stripped = _strip_cached_subtrees(plan)
    assert stripped.count("Scan parquet") <= 1, stripped
    # and the cache boundary is actually present (the rescan cure)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan


def test_chunk_documents_no_subset_trailing_chunk(spark):
    from shaha_spark.operators.chunking import chunk_documents

    # 32 tokens, chunk=32, overlap=8: the naive window grid would also
    # emit chunk 1 = tokens 24..31, a strict subset of chunk 0
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(32)))], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk=32, overlap=8).collect()
    assert len(rows) == 1 and rows[0].chunk_id == 0 and rows[0].n_tokens == 32


def test_hll_null_items_excluded(spark):
    from shaha_spark.operators.sketch import hll_distinct

    vals = spark.createDataFrame([("x",), (None,), (None,)], "v string")
    just_x = spark.createDataFrame([("x",)], "v string")
    est_with_nulls = hll_distinct(vals, "v").head()
    est_clean = hll_distinct(just_x, "v").head()
    assert est_with_nulls.hll_estimate == est_clean.hll_estimate
    assert est_with_nulls.n_registers == 1


def test_dedup_duplicate_lines_metachar_separator(spark):
    from shaha_spark.operators.dedup import dedup_duplicate_lines

    # '.'-separated "lines"; the boilerplate sentence appears in both
    # docs and must be removed; '.' must split literally, not as regex
    df = spark.createDataFrame(
        [(1, "unique one.SPAM AD.keep me"), (2, "SPAM AD.other text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in
           dedup_duplicate_lines(df, min_docs=2, sep=".").collect()}
    assert out[1] == "unique one.keep me"
    assert out[2] == "other text"


def test_temperature_resample_null_stratum_not_dropped(spark):
    from shaha_spark.operators.sampling import temperature_resample

    rows = [(i, "en") for i in range(50)] + [(i + 100, None) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_resample(df, "lang", "doc_id", alpha=1.0)
    # alpha=1, no budget -> every stratum rate 1.0: nothing may vanish
    assert out.count() == 100
    assert out.where(F.col("lang").isNull()).count() == 50


def test_hash_sample_fraction_rounds_to_documented_resolution(spark):
    from shaha_spark.operators.sampling import hash_sample
    from shaha_spark.operators.sampling import _bucket

    # 0.57 * 10000 is 5699.999... in IEEE; int() used to truncate to
    # 5699 - one bucket short of the documented 1/10000 resolution
    df = spark.createDataFrame([(i,) for i in range(20000)], "k long")
    got = hash_sample(df, 0.57, "k").count()
    want = df.where(_bucket(F.col("k"), "") < 5700).count()
    assert got == want


def test_trigram_fuzzy_pairs_rejects_min_len_below_3(spark):
    from shaha_spark.operators.dedup import trigram_fuzzy_pairs

    df = spark.createDataFrame([("ab",)], "word string")
    with pytest.raises(ValueError, match="min_len"):
        trigram_fuzzy_pairs(df, min_len=2)


def test_minhash_eval_rejects_zero_threshold(spark):
    from shaha_spark.operators.dedup import minhash_eval

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="jaccard_threshold"):
        minhash_eval(df, jaccard_threshold=0.0)


def test_hll_small_range_correction(spark):
    from shaha_spark.operators.sketch import hll_distinct

    # 15 distinct values, m=256 registers: the raw harmonic-mean
    # estimate reads ~190 (order-of-magnitude wrong); linear counting
    # must bring it within HLL's error bound of the truth
    df = spark.createDataFrame([(f"v{i % 15}",) for i in range(100)], "v string")
    est = hll_distinct(df, "v", p=8).head().hll_estimate
    assert abs(est - 15) / 15 < 0.2, est


def test_keep_best_unscored_member_still_loses(spark):
    from shaha_spark.operators.components import keep_best_per_component

    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    # only doc 1 is scored; doc 2 (identical text) must still lose
    score = spark.createDataFrame([(1, 0.9)], "doc_id long, quality double")
    ids = {r.doc_id for r in keep_best_per_component(df, score).collect()}
    assert ids == {1}


def test_connected_components_raises_when_unconverged(spark):
    from shaha_spark.operators.components import connected_components

    # a 12-node chain needs ~10 propagation rounds; cap at 2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=2)
    # and converges fine with the default budget
    comps = connected_components(edges)
    assert {r.comp for r in comps.collect()} == {1}


def test_ndcg_reports_zero_for_missing_queries(spark):
    from shaha_spark.operators.similarity import ndcg_at_k

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 10, 1)],
        "query_id long, vec_id long, rank long",
    )
    # approx returned nothing for query 2
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, vec_id long, rank long"
    )
    out = {r.query_id: r.ndcg for r in ndcg_at_k(exact, approx, k=2).collect()}
    assert set(out) == {1, 2}
    assert out[2] == 0.0 and out[1] > 0.0


def test_top_principal_component_degenerate_corpus_raises(spark):
    from shaha_spark.operators.embeddings import top_principal_component

    df = spark.createDataFrame(
        [(1, [0.5, 0.25]), (2, [0.5, 0.25])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="power iterate"):
        top_principal_component(df)


def test_dim_probe_skips_null_vectors(spark):
    from shaha_spark.operators.embeddings import _dim

    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    assert _dim(df, "embedding") == 3
    all_null = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="non-null"):
        _dim(all_null, "embedding")


def test_asof_join_ignores_null_time_right_rows(spark):
    from shaha_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 5)], "k long, t long")
    right = spark.createDataFrame([(1, None, "ghost")], "k long, t long, rv string")
    out = asof_join(left, right, "k", "t", ["rv"]).collect()
    # the null-time right row must not match as a predecessor
    assert len(out) == 1 and out[0].asof_rv is None


def test_nearest_join_string_order_col_no_ansi_crash(spark):
    from shaha_spark.operators.joins import nearest_join

    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, lv string")
    right = spark.createDataFrame(
        [(1, 90, "open"), (1, 250, "closed")], "k long, t long, status string"
    )
    out = nearest_join(
        left, right, key_col="k", time_col="t", tolerance=50,
        right_value_cols=["status"], order_col="status",
    ).collect()
    assert len(out) == 1
    assert out[0].near_status == "open" and out[0].near_delta == 10


def test_interval_join_long_interval_middle_buckets(spark):
    from shaha_spark.operators.joins import interval_join

    events = spark.createDataFrame([(1, 15)], "k long, t long")
    intervals = spark.createDataFrame(
        [(1, 0, 30, "iv")], "k long, start_us long, end_us long, name string"
    )
    # interval longer than max_len: the middle-bucket event must match
    out = interval_join(events, intervals, "k", "t", max_len=10).collect()
    assert len(out) == 1 and out[0].name == "iv"


def test_k_core_raises_when_peeling_unconverged(spark):
    from shaha_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(edges, k=2, max_iters=2)
    # a path graph has an empty 2-core at the true fixpoint
    assert k_core(edges, k=2, max_iters=50).count() == 0


def test_pagerank_empty_edges_returns_empty(spark):
    from shaha_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame([], "id_a long, id_b long")
    out = pagerank_fixed(edges)
    assert out.count() == 0
    assert set(out.columns) == {"node", "rank_fp"}


def test_dedup_keep_latest_full_row_tiebreak(spark):
    from shaha_spark.operators.joins import dedup_keep_latest

    # two rows tie on (key, tie_col); the struct tiebreak must pick the
    # same row regardless of partitioning
    df = spark.createDataFrame(
        [(1, 10, "b"), (1, 10, "a")], "k long, seq long, v string"
    )
    for parts in (1, 7):
        out = dedup_keep_latest(df.repartition(parts), ["k"], "seq").collect()
        assert len(out) == 1 and out[0].v == "a"


def test_token_budget_null_text_counts_zero_tokens(spark):
    """ADVICE r4: size(tokens(NULL)) is -1 under legacy sizeOfNull,
    which silently corrupted the running token total while the DuckDB
    twin skipped the row. Both sides now pin null text to 0 tokens."""
    from shaha_spark.operators.sampling import token_budget_select

    rows = [(1, 100, "alpha beta"), (2, 90, None), (3, 80, "gamma")]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long, text string")
    out = {r.doc_id: r for r in token_budget_select(df, budget=3).collect()}
    # doc 1 (2 tokens, start 0) and doc 2 (0 tokens, start 2) fit;
    # doc 3 starts at 2 as well (null text added nothing) and is the
    # straddler crossing the boundary -> kept by convention
    assert out[2].n_tokens == 0 and out[2].start == 2
    assert out[3].start == 2
    assert set(out) == {1, 2, 3}


def test_charclass_scan_null_text_is_suspect(spark):
    """A NULL text yields NULL counts in BOTH engines (length(NULL) is
    NULL there too) but a deterministic suspect=true via the
    letter-fraction rule's 0.0 fallback — no evidence of clean text."""
    from shaha_spark.operators.textops import charclass_scan

    df = spark.createDataFrame(
        [(1, None), (2, "ok words")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.asDict() for r in charclass_scan(df).collect()}
    assert got[1]["n_chars"] is None and got[1]["alpha_frac"] == 0.0
    assert got[1]["suspect"] is True
    assert got[2]["suspect"] is False


def test_vocab_growth_null_text_contributes_nothing(spark):
    """NULL-text docs drop at the explode (split(NULL) → no rows), the
    same convention as the tokens() family; totals count only real
    tokens."""
    from shaha_spark.operators.terms import vocab_growth

    df = spark.createDataFrame(
        [(1, None), (2, "a b a")], "doc_id bigint, text string"
    )
    out = sorted(vocab_growth(df, n_buckets=4).collect(), key=lambda r: r.bucket)
    assert out[-1].cum_tokens == 3 and out[-1].cum_types == 2


def test_source_matrix_null_source_labels_empty(spark):
    """A NULL source labels as '' instead of vanishing into
    least/greatest's null-skipping (which would mislabel a null↔s pair
    as same-source (s, s))."""
    from shaha_spark.operators.dedup import near_dup_source_matrix

    docs = spark.createDataFrame(
        [(1, None), (2, "s")], "doc_id bigint, source string"
    )
    edges = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    rows = near_dup_source_matrix(docs, edges).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert (r["source_a"], r["source_b"]) == ("", "s")
    assert r["cross_source"] is True
