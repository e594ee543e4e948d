"""Late round-3 additions: duplicate-span removal, temperature mixture
resampling, and the hashed-feature logistic-regression quality
classifier. Behavioral tests plus differential checks (pure-Python twin
for the classifier, inline DuckDB parity for the SQL-expressible ops) —
round-4 registration candidates per ROUND3.md.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from shaha_spark.operators import classifier, sampling, terms


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


# ------------------------------------------------- remove_dup_gram_spans

def test_remove_dup_spans_planted_boilerplate(spark):
    boiler = "click here to accept all cookies now"
    rows = [
        Row(doc_id=1, text=f"alpha beta gamma {boiler} delta epsilon"),
        Row(doc_id=2, text=f"{boiler} zeta eta theta iota kappa"),
        Row(doc_id=3, text="totally unique words in this one document here"),
        Row(doc_id=4, text="short"),
    ]
    out = terms.remove_dup_gram_spans(
        spark.createDataFrame(rows), n=5
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 4
    for w in boiler.split():
        assert w not in by_id[1].clean_text.split()
        assert w not in by_id[2].clean_text.split()
    assert by_id[1].clean_text == "alpha beta gamma delta epsilon"
    assert by_id[2].clean_text == "zeta eta theta iota kappa"
    assert by_id[3].clean_text == rows[2].text and by_id[3].n_removed == 0
    # fewer than n tokens -> no grams -> untouched
    assert by_id[4].clean_text == "short" and by_id[4].n_removed == 0
    assert by_id[1].n_tokens == 12 and by_id[1].n_removed == 7


def _remove_dup_spans_py(texts: dict[int, str], n: int, min_df: int = 2):
    toks = {d: [w for w in t.split(" ") if w] for d, t in texts.items()}
    occ = {}  # gram -> set of docs
    for d, ws in toks.items():
        for i in range(len(ws) - n + 1):
            occ.setdefault(" ".join(ws[i : i + n]), set()).add(d)
    dup = {g for g, ds in occ.items() if len(ds) >= min_df}
    out = {}
    for d, ws in toks.items():
        covered = set()
        for i in range(len(ws) - n + 1):
            if " ".join(ws[i : i + n]) in dup:
                covered.update(range(i, i + n))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[d] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


def test_remove_dup_spans_differential_random(spark):
    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(30)]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for d in range(40)
    }
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in texts.items()]
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in terms.remove_dup_gram_spans(df, n=3).collect()
    }
    assert got == _remove_dup_spans_py(texts, n=3)


DUP_SPAN_SQL = """
WITH toks0 AS (
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
       coalesce(t.n_tokens, 0) AS n_tokens,
       coalesce(t.n_tokens, 0) - coalesce(a.n_kept, 0) AS n_removed
FROM documents d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN tot t USING (doc_id)
"""


def test_remove_dup_spans_duckdb_parity(spark, docs, sf_dir):
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in terms.remove_dup_gram_spans(docs, n=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        d: (c, n, r) for d, c, n, r in con.execute(DUP_SPAN_SQL).fetchall()
    }
    con.close()
    assert got == want


def test_remove_dup_spans_mass_duplicate_stress(spark):
    """Hot-key stress: every document shares the same 5-gram (the
    worst-case skew for the duplicate-gram join) plus a unique tail.
    The operator must stay correct — and the coverage explode stays
    bounded at n rows per occurrence, so no quadratic blowup."""
    boiler = "one two three four five"
    n_docs = 400
    df = spark.createDataFrame(
        [Row(doc_id=d, text=f"{boiler} unique{d}a unique{d}b") for d in range(n_docs)]
    )
    out = terms.remove_dup_gram_spans(df, n=5).collect()
    assert len(out) == n_docs
    for r in out:
        # the shared 5-gram covers positions 0-4 AND 1-5, 2-6 windows
        # only where they match across docs; only the boiler tokens are
        # corpus-duplicated, the unique tail survives
        assert r.clean_text == f"unique{r.doc_id}a unique{r.doc_id}b"
        assert r.n_removed == 5 and r.n_tokens == 7


# ---------------------------------------------------- temperature mixture

def test_temperature_rates_math(spark, docs):
    counts = {
        r.lang: r.c
        for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    alpha, n = 0.5, sum(counts.values())
    z = sum((c / n) ** alpha for c in counts.values())
    got = {
        r.stratum: (r.n_docs, r.rate)
        for r in sampling.temperature_rates(docs, "lang", alpha).collect()
    }
    assert set(got) == set(counts)
    for lang, c in counts.items():
        want = min(1.0, n * ((c / n) ** alpha / z) / c)
        assert got[lang][0] == c
        assert got[lang][1] == pytest.approx(want, rel=1e-12)
    # alpha < 1 boosts rare strata to full retention, trims the dominant
    rare = min(counts, key=counts.get)
    dom = max(counts, key=counts.get)
    if counts[rare] != counts[dom]:
        assert got[rare][1] > got[dom][1]


def test_temperature_resample_alpha1_keeps_all(spark, docs):
    n = docs.count()
    out = sampling.temperature_resample(docs, "lang", "doc_id", alpha=1.0)
    assert out.count() == n
    assert out.columns == docs.columns


def test_temperature_resample_budget_and_nesting(spark, docs):
    half = sampling.temperature_resample(
        docs, "lang", "doc_id", alpha=0.7, budget=docs.count() // 2
    )
    quarter = sampling.temperature_resample(
        docs, "lang", "doc_id", alpha=0.7, budget=docs.count() // 4
    )
    h, q = half.count(), quarter.count()
    assert 0 < q < h < docs.count()
    # same salt + smaller budget => strictly nested membership
    q_ids = {r.doc_id for r in quarter.select("doc_id").collect()}
    h_ids = {r.doc_id for r in half.select("doc_id").collect()}
    assert q_ids <= h_ids


TEMP_RATES_SQL = """
WITH counts AS (
  SELECT lang AS stratum, count(*) AS n_docs FROM documents GROUP BY lang
), powed AS (
  SELECT stratum, n_docs,
         pow(n_docs::DOUBLE / sum(n_docs) OVER (), {alpha}) AS pa,
         sum(n_docs) OVER () AS n
  FROM counts
)
SELECT stratum, n_docs,
       least(1.0, n::DOUBLE * (pa / sum(pa) OVER ()) / n_docs::DOUBLE) AS rate
FROM powed
"""


def test_temperature_rates_duckdb_parity(spark, docs, sf_dir):
    got = {
        r.stratum: (r.n_docs, round(r.rate, 10))
        for r in sampling.temperature_rates(docs, "lang", 0.7).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        s: (n, round(r, 10))
        for s, n, r in con.execute(
            TEMP_RATES_SQL.format(alpha=0.7)
        ).fetchall()
    }
    con.close()
    assert got == want


# ------------------------------------------- trigram stupid backoff LM

def test_trigram_backoff_all_three_tiers(spark):
    import math

    lm = spark.createDataFrame([Row(doc_id=100, text="a b c a b d")])
    scored = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c x y z"),  # tier1 + 3×tier3
            Row(doc_id=2, text="d b c"),        # tier2 (unseen trigram, seen bigram)
            Row(doc_id=3, text="a b"),          # too short -> no trigrams
        ]
    )
    out = {r.doc_id: r for r in terms.trigram_backoff_logprob(scored, lm).collect()}
    # LM: N=6 tokens, V=4 vocab; c2(a,b)=2, c2(b,c)=1, c1(b)=2
    t1 = round(math.log(1 / 2), 8)                   # S(c|a,b) = c3/c2 = 1/2
    t3 = round(math.log(0.4 * 0.4 * 1.0 / 10.0), 8)  # unseen word floor
    assert out[1].n_trigrams == 4
    assert out[1].avg_logprob == pytest.approx((t1 + 3 * t3) / 4, abs=1e-9)
    t2 = round(math.log(0.4 * 1 / 2), 8)             # S(c|b) backoff
    assert out[2].n_trigrams == 1
    assert out[2].avg_logprob == pytest.approx(t2, abs=1e-9)
    assert out[3].n_trigrams == 0 and out[3].avg_logprob is None


# --------------------------------------------------- quality classifier

def _toy_corpus(spark, n=120, seed=7):
    rng = random.Random(seed)
    good = ["clear", "prose", "with", "substance", "and", "structure"]
    bad = ["buy", "now", "click", "spam", "free", "winner"]
    rows = []
    for d in range(n):
        y = d % 2
        pool = good if y else bad
        words = [rng.choice(pool) for _ in range(rng.randint(5, 15))]
        # a little cross-contamination so it isn't trivially separable
        if rng.random() < 0.3:
            words.append(rng.choice(bad if y else good))
        rows.append(Row(doc_id=d, text=" ".join(words), label=y))
    return spark.createDataFrame(rows)


def test_hashed_features_shape(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a"), Row(doc_id=2, text="")]
    )
    out = {r.doc_id: r.feats for r in classifier.hashed_features(df, dim=16).collect()}
    assert out[2] == []
    feats = out[1]
    assert all(0 <= p.idx < 16 for p in feats)
    assert [p.idx for p in feats] == sorted(p.idx for p in feats)
    assert sum(p.val for p in feats) == pytest.approx(1.0)
    # "a" appears twice of three tokens
    assert max(p.val for p in feats) == pytest.approx(2 / 3)


def test_logreg_separates_quality(spark):
    corpus = _toy_corpus(spark)
    feats = classifier.hashed_features(
        corpus, dim=64, keep_cols=("label",)
    ).cache()
    w, b = classifier.logreg_train(feats, dim=64, iters=40, lr=4.0)
    scored = classifier.logreg_score(feats, w, b).select("label", "quality_prob")
    rows = scored.collect()
    pos = [r.quality_prob for r in rows if r.label == 1]
    neg = [r.quality_prob for r in rows if r.label == 0]
    assert sum(pos) / len(pos) > 0.75
    assert sum(neg) / len(neg) < 0.25
    acc = (
        sum(1 for p in pos if p > 0.5) + sum(1 for p in neg if p <= 0.5)
    ) / len(rows)
    assert acc > 0.9


def test_logreg_differential_vs_local(spark):
    corpus = _toy_corpus(spark, n=60, seed=11)
    dim = 32
    feats = classifier.hashed_features(
        corpus, dim=dim, keep_cols=("label",)
    ).cache()
    w, b = classifier.logreg_train(feats, dim=dim, iters=10, lr=1.0)
    local_rows = [
        ([(p.idx, p.val) for p in r.feats], r.label)
        for r in feats.select("feats", "label").collect()
    ]
    lw, lb = classifier.logreg_train_local(local_rows, dim=dim, iters=10, lr=1.0)
    assert b == pytest.approx(lb, abs=1e-6)
    for a, c in zip(w, lw):
        assert a == pytest.approx(c, abs=1e-6)


def test_logreg_distributed_matches_literal_trainer(spark):
    corpus = _toy_corpus(spark, n=60, seed=5)
    dim = 32
    feats = classifier.hashed_features(
        corpus, dim=dim, keep_cols=("label",)
    ).cache()
    w_lit, b_lit = classifier.logreg_train(feats, dim=dim, iters=8, lr=1.0)
    wdf = classifier.logreg_train_distributed(feats, dim=dim, iters=8, lr=1.0)
    got = {r.idx: r.w for r in wdf.collect()}
    assert set(got) == set(range(-1, dim))
    # margins are decimal-rounded in the distributed path, so agreement
    # is float-tolerance, not bit-exact
    assert got[-1] == pytest.approx(b_lit, abs=1e-5)
    for i in range(dim):
        assert got[i] == pytest.approx(w_lit[i], abs=1e-5)


def test_logreg_distributed_partitioning_invariant(spark):
    corpus = _toy_corpus(spark, n=40, seed=9)
    feats = classifier.hashed_features(corpus, dim=16, keep_cols=("label",))
    w1 = {
        r.idx: r.w
        for r in classifier.logreg_train_distributed(
            feats.repartition(1), dim=16, iters=4
        ).collect()
    }
    w8 = {
        r.idx: r.w
        for r in classifier.logreg_train_distributed(
            feats.repartition(8), dim=16, iters=4
        ).collect()
    }
    assert w1 == w8


def test_logreg_score_joined_matches_literal(spark):
    corpus = _toy_corpus(spark, n=40, seed=2)
    dim = 32
    feats = classifier.hashed_features(corpus, dim=dim).cache()
    w = [((i * 13) % 9 - 4) / 4.0 for i in range(dim)]
    lit = {
        r.doc_id: r.quality_prob
        for r in classifier.logreg_score(feats, w, 0.25).collect()
    }
    wdf = corpus.sparkSession.createDataFrame(
        [(i, w[i]) for i in range(dim)] + [(-1, 0.25)], "idx int, w double"
    )
    joined = {
        r.doc_id: r.quality_prob
        for r in classifier.logreg_score_joined(feats, wdf).collect()
    }
    assert set(lit) == set(joined)
    for d in lit:
        assert joined[d] == pytest.approx(lit[d], abs=1e-6)


def test_logreg_deterministic_across_partitionings(spark):
    corpus = _toy_corpus(spark, n=60, seed=3)
    feats = classifier.hashed_features(corpus, dim=32, keep_cols=("label",))
    w1, b1 = classifier.logreg_train(feats.repartition(1), dim=32, iters=5)
    w8, b8 = classifier.logreg_train(feats.repartition(8), dim=32, iters=5)
    assert w1 == w8 and b1 == b8
