"""Round-4 addition operators: positional phrase search, winnowing
fingerprints, token-budget selection, diverse sampling. Oracle parity
runs in tests/test_oracle.py; these are the semantic edge cases the
generic comparison can't state."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from shaha_spark.operators.sampling import diverse_sample, token_budget_select
from shaha_spark.operators.search import phrase_search, postings, postings_stats
from shaha_spark.operators.textops import winnow_fingerprints


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


def test_phrase_search_exact_positions(spark):
    docs = _docs(spark, [
        "a b c a b",          # "a b" at 0 and 3
        "b a b a",            # "a b" at 1
        "a a a",              # no "a b"
        "",                   # empty
    ])
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, "a b").collect()}
    assert got == {0: 2, 1: 1}


def test_phrase_search_trigram_and_overlap(spark):
    docs = _docs(spark, ["x x x x", "x x", "y x x x"])
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, "x x x").collect()}
    # overlapping occurrences both count: positions 0 and 1 in doc 0
    assert got == {0: 2, 2: 1}


def test_phrase_search_rejects_empty(spark):
    docs = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        phrase_search(docs, "   ")


def test_postings_positions_are_0_based_and_complete(spark):
    docs = _docs(spark, ["w0  w1 w2"])  # double space must not emit empties
    got = sorted((r.term, r.pos) for r in postings(docs).collect())
    assert got == [("w0", 0), ("w1", 1), ("w2", 2)]


def test_postings_stats_orders_by_df_then_term(spark):
    docs = _docs(spark, ["a b", "a c", "b a"])
    got = [(r.term, r.doc_freq, r.total_occurrences)
           for r in postings_stats(docs, top=3).collect()]
    assert got == [("a", 3, 3), ("b", 2, 2), ("c", 1, 1)]


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Any shared run of k + w - 1 tokens must share >= 1 fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = k+w-1 for k=3,w=4
    docs = _docs(spark, [
        f"one two {shared} three",
        f"{shared} other tail words here",
    ])
    fp = winnow_fingerprints(docs, k=3, w=4)
    by_doc = {
        d: {r.fingerprint for r in rows}
        for d, rows in (
            (d, [r for r in fp.collect() if r.doc_id == d]) for d in (0, 1)
        )
    }
    assert by_doc[0] & by_doc[1], "shared 6-token run must share a fingerprint"


def test_winnowing_short_doc_single_window(spark):
    docs = _docs(spark, ["a b c", "a b", ""])  # 1 shingle / 0 / 0
    rows = winnow_fingerprints(docs, k=3, w=4).collect()
    assert {r.doc_id for r in rows} == {0}
    assert len(rows) == 1  # one window over the single shingle


def test_winnowing_is_position_robust(spark):
    """The same content prefixed by different junk still fingerprints
    identically beyond the boundary windows — the winnowing property
    that exact chunk hashing lacks."""
    body = " ".join(f"tok{i}" for i in range(30))
    docs = _docs(spark, [body, "junk1 junk2 junk3 " + body])
    fp = winnow_fingerprints(docs, k=3, w=4)
    sets = {}
    for r in fp.collect():
        sets.setdefault(r.doc_id, set()).add(r.fingerprint)
    inter = sets[0] & sets[1]
    assert len(inter) >= len(sets[0]) * 0.7


def test_token_budget_boundary_and_order(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d", n_chars=400),   # 4 tokens, best
            Row(doc_id=2, text="e f g", n_chars=300),     # 3 tokens
            Row(doc_id=3, text="h i", n_chars=200),       # 2 tokens
            Row(doc_id=4, text="j", n_chars=100),         # 1 token
        ]
    )
    got = {r.doc_id: (r.start, r.n_tokens)
           for r in token_budget_select(docs, budget=6).collect()}
    # order: 1 (start 0), 2 (start 4) straddles 6 -> kept; 3 (start 7) out
    assert got == {1: (0, 4), 2: (4, 3)}
    # ties on score break by id: equal scores select lower ids first
    tied = spark.createDataFrame(
        [Row(doc_id=i, text="x y", n_chars=100) for i in (5, 3, 9)]
    )
    sel = {r.doc_id: r.start for r in token_budget_select(tied, budget=3).collect()}
    assert sel == {3: 0, 5: 2}


def test_token_budget_matches_global_window_on_random_scores(spark):
    """Bucketed prefix sum == the global-order running sum, including
    bucket-boundary ties (hypothesis-style randomized check)."""
    import random

    rng = random.Random(7)
    rows = [
        Row(doc_id=i,
            text=" ".join("t" * 1 for _ in range(rng.randint(1, 9))),
            n_chars=rng.choice([64, 64, 65, 128, 129, 300, 301]))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows)
    got = {(r.doc_id, r.start) for r in token_budget_select(docs, budget=400).collect()}
    # reference computation in plain python
    sized = sorted(((r.n_chars, r.doc_id, len(r.text.split())) for r in rows),
                   key=lambda x: (-x[0], x[1]))
    acc, want = 0, set()
    for score, did, ntok in sized:
        if acc < 400:
            want.add((did, acc))
        acc += ntok
    assert got == want


def test_diverse_sample_quota_and_coverage(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = diverse_sample(embs, k=4, iters=2, per_cluster=5).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r.centroid_id, []).append(r)
    assert set(by_c) == {1, 2, 3, 4}  # every cluster contributes
    for c, rows in by_c.items():
        assert len(rows) <= 5
        ranks = sorted(r.quota_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ids = [r.vec_id for r in sorted(rows, key=lambda r: r.quota_rank)]
        assert ids == sorted(ids)  # id-ordered quota


def test_phrase_search_order_invariant_and_rarest_anchor(spark):
    """Join order must not change results; the chain anchors at the
    rarest term so a stopword-heavy phrase never floods the first join."""
    docs = _docs(spark, [
        " ".join(["the"] * 50 + ["needle", "the"]),
        " ".join(["the"] * 30),
        "needle the end",
    ])
    got = {r.doc_id: r.n_matches
           for r in phrase_search(docs, "needle the").collect()}
    assert got == {0: 1, 2: 1}
    # reversed-frequency phrase gives the mirrored positions
    got2 = {r.doc_id: r.n_matches
            for r in phrase_search(docs, "the needle").collect()}
    assert got2 == {0: 1}


def test_phrase_terms_match_document_tokenization(spark):
    """ADVICE r4: a phrase containing tabs/newlines must tokenize with
    the same whitespace class documents are indexed with, or it can
    never match any posting."""
    from shaha_spark.operators.search import phrase_search

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha gamma")],
        "doc_id long, text string",
    )
    out = phrase_search(df, "alpha\tbeta\ngamma").collect()
    assert len(out) == 1 and out[0].doc_id == 1 and out[0].n_matches == 1
