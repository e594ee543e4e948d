"""Term statistics, n-gram generation, and decontamination semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from shaha_spark.operators.terms import (
    decontaminate,
    term_stats,
    word_ngrams,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a c"),
            (2, "a  b"),  # double space → empty token must vanish
            (3, ""),
        ],
        "doc_id bigint, text string",
    )


def test_term_stats_tf_df_weight(spark, docs):
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["n_docs"], r["weight"])
        for r in term_stats(docs).collect()
    }
    # 'a': doc1 tf=2, doc2 tf=1; df=2; n_docs=3 (empty doc counts)
    assert rows[(1, "a")] == (2, 2, 3, 2 * (3 / 2))
    assert rows[(2, "a")] == (1, 2, 3, 1 * (3 / 2))
    assert rows[(1, "c")] == (1, 1, 3, 1 * (3 / 1))
    assert (3, "") not in rows and (2, "") not in rows


def test_word_ngrams_window_and_edges(spark, docs):
    grams = {
        (r["doc_id"], r["gram"]) for r in word_ngrams(docs, 2).collect()
    }
    # doc2's empty middle token must not break adjacency: gram is "a b"
    assert grams == {(1, "a b"), (1, "b a"), (1, "a c"), (2, "a b")}
    # n larger than any document → empty, not an error
    assert word_ngrams(docs, 9).count() == 0
    with pytest.raises(ValueError):
        word_ngrams(docs, 0)


def test_word_ngrams_distinct(spark):
    d = spark.createDataFrame([(1, "x y x y x y")], "doc_id bigint, text string")
    rows = word_ngrams(d, 2).collect()
    assert sorted(r["gram"] for r in rows) == ["x y", "y x"]


def test_decontaminate_flags_overlap_only(spark):
    train = spark.createDataFrame(
        [(1, "p q r s"), (2, "unrelated words here now")],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [(100, "z p q r s z")], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: (r["n_shared_grams"], r["contaminated"])
        for r in decontaminate(train, ev, n=3).collect()
    }
    # train doc 1 shares "p q r" and "q r s"; doc 2 shares nothing
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert len(out) == 2  # every train row present


def test_decontaminate_counts_distinct_grams(spark):
    # a gram repeated in the train doc counts once (distinct pairs)
    train = spark.createDataFrame([(1, "p q p q p q")], "doc_id bigint, text string")
    ev = spark.createDataFrame([(9, "p q")], "doc_id bigint, text string")
    out = decontaminate(train, ev, n=2).collect()[0]
    assert out["n_shared_grams"] == 1


def test_term_stats_single_corpus_scan_for_tf_df(spark, docs):
    # the tf→df reuse means the exploded corpus subtree must appear once
    # on the df side via exchange reuse, not as a second full pipeline
    plan = term_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ----------------------------------------------------- new corpus ops

def test_top_vocab_order_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b b a a c"), (2, "a b")],
        "doc_id bigint, text string",
    )
    from shaha_spark.operators.terms import top_vocab

    rows = [(r["term"], r["n_occurrences"]) for r in top_vocab(docs, 2).collect()]
    # a and b both occur 3 times; tie breaks on term asc
    assert rows == [("a", 3), ("b", 3)]


def test_oov_rate_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b zz"), (2, ""), (3, "zz zz")],
        "doc_id bigint, text string",
    )
    vocab = spark.createDataFrame([("a",), ("b",)], "term string")
    from shaha_spark.operators.terms import oov_rate

    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"]) for r in oov_rate(docs, vocab).collect()}
    assert got[1] == (3, 1, pytest.approx(1 / 3))
    assert got[2] == (0, 0, 0.0)  # empty doc: rate defined as 0, no div-by-zero
    assert got[3] == (2, 2, 1.0)


def test_ngram_repetition_counts_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "x y z x y z x y"), (2, "a b"), (3, "p q r s")],
        "doc_id bigint, text string",
    )
    from shaha_spark.operators.terms import ngram_repetition

    got = {r["doc_id"]: (r["n_grams"], r["n_unique_grams"], r["dup_gram_ratio"]) for r in ngram_repetition(docs, 3).collect()}
    # doc 1: 6 trigram occurrences, 3 distinct (x y z / y z x / z x y each twice)
    assert got[1] == (6, 3, pytest.approx(0.5))
    assert got[2] == (0, 0, 0.0)  # shorter than n → zero grams, not dropped
    assert got[3] == (2, 2, 0.0)


def test_tf_cosine_pairs_identical_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "q r s")],
        "doc_id bigint, text string",
    )
    from shaha_spark.operators.terms import tf_cosine_pairs

    rows = tf_cosine_pairs(docs, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["cosine"] == pytest.approx(1.0)


def test_tf_cosine_pairs_max_df_drops_stop_terms(spark):
    # 'the' appears in every doc; with max_df=2 it can't generate pairs
    docs = spark.createDataFrame(
        [(1, "the a"), (2, "the b"), (3, "the c")],
        "doc_id bigint, text string",
    )
    from shaha_spark.operators.terms import tf_cosine_pairs

    assert tf_cosine_pairs(docs, threshold=0.0, max_df=2).count() == 0
    assert tf_cosine_pairs(docs, threshold=0.0, max_df=None).count() == 3


def test_dup_gram_stats_flags_shared_spans(spark):
    from shaha_spark.operators.terms import dup_gram_stats

    docs = spark.createDataFrame(
        [
            (1, "p q r s t u"),      # grams: pqrst, qrstu
            (2, "z p q r s t"),      # grams: zpqrs, pqrst  (shares pqrst with 1)
            (3, "m n o p q"),        # one gram, unique
            (4, "a b"),              # < n tokens → no grams → absent
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_fraction"])
        for r in dup_gram_stats(docs, n=5).collect()
    }
    assert got[1] == (2, 1, pytest.approx(0.5))
    assert got[2] == (2, 1, pytest.approx(0.5))
    assert got[3] == (1, 0, 0.0)
    assert 4 not in got


def test_bigram_logprob_conditional_model(spark):
    import math

    from shaha_spark.operators.terms import bigram_logprob

    # corpus bigrams: (a,b) x2, (b,a) x1, (b,c) x1
    # c1: a→2?? no: 'a' starts (a,b),(a,b) → c1(a)=2; 'b' starts (b,a),(b,c) → c1(b)=2
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b c")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob(docs).collect()
    }
    lp_ab = round(math.log(2 / 2), 8)   # (a,b): c2=2, c1(a)=2
    lp_ba = round(math.log(1 / 2), 8)   # (b,a)
    lp_bc = round(math.log(1 / 2), 8)   # (b,c)
    assert got[1] == (2, pytest.approx((lp_ab + lp_ba) / 2))
    assert got[2] == (2, pytest.approx((lp_ab + lp_bc) / 2))


def test_bpe_pair_counts_vocab_weighted(spark):
    from shaha_spark.operators.terms import bpe_pair_counts

    # vocab: 'abab' freq 2, 'ab' freq 1, 'x' freq 3 (too short → no pairs)
    docs = spark.createDataFrame(
        [(1, "abab ab x x"), (2, "abab x")],
        "doc_id bigint, text string",
    )
    rows = bpe_pair_counts(docs, k=10).collect()
    got = {r["pair"]: r["cnt"] for r in rows}
    # 'abab' pairs: ab, ba, ab → ab x2, ba x1 (weighted by freq 2)
    # 'ab' pairs: ab x1 (freq 1)
    assert got == {"ab": 2 * 2 + 1, "ba": 2}
    # deterministic total order: count desc then pair asc
    assert [r["pair"] for r in rows] == ["ab", "ba"]


def test_top_keywords_rare_terms_win(spark):
    from shaha_spark.operators.terms import top_keywords

    # 'common' is in every doc (df=3, weight=tf*1); 'rare' only in doc 1
    docs = spark.createDataFrame(
        [
            (1, "common rare rare other"),
            (2, "common other"),
            (3, "common common"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["weight"])
        for r in top_keywords(docs, k=2).collect()
    }
    # doc 1: rare tf=2 df=1 -> weight 6; other tf=1 df=2 -> 1.5; common 1
    assert got[(1, 1)] == ("rare", 6.0)
    assert got[(1, 2)] == ("other", 1.5)
    # doc 3: only 'common' (tf=2, df=3 -> weight 2.0); no rank-2 row
    assert got[(3, 1)] == ("common", 2.0)
    assert (3, 2) not in got


def test_bpe_train_local_bit_matches_distributed(spark):
    """bpe_train_local (one collect + driver-side rounds — the
    production shape for 32k-merge lists) must produce the EXACT merge
    list of the distributed per-round loop: same counts, same
    (count desc, l, r) tie-break, same greedy merge rule."""
    from shaha_spark.operators.terms import bpe_train, bpe_train_local

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert bpe_train_local(docs, num_merges=16) == bpe_train(docs, num_merges=16)


def test_bpe_train_local_bit_matches_on_adversarial_corpus(spark):
    import random

    rng = random.Random(3)
    # heavy ties + overlap-prone runs (aaa..., abab...) stress both the
    # tie-break and the greedy non-overlapping rule
    words = ["aaa", "aaaa", "abab", "ababab", "ba", "ab", "aab", "bba"]
    rows = [
        (i, " ".join(rng.choices(words, k=rng.randrange(1, 12))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    from shaha_spark.operators.terms import bpe_train, bpe_train_local

    assert bpe_train_local(docs, num_merges=12, min_count=1) == bpe_train(
        docs, num_merges=12, min_count=1
    )


def test_bpe_train_refuses_production_scale_merge_lists(spark):
    from shaha_spark.operators.terms import bpe_train

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="bpe_train_local"):
        bpe_train(docs, num_merges=513)


def test_bpe_train_local_vocab_bound(spark):
    from shaha_spark.operators.terms import bpe_train_local

    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="max_vocab"):
        bpe_train_local(docs, num_merges=2, max_vocab=3)
