"""Round-11 operators: URL canonicalizer hardening (bare tracking
params, bracketed IPv6, parameterized public-suffix set),
contamination provenance reporting, domain-level DSIR, and the
licence-signal scan. Cross-engine agreement for the URL functions is
asserted directly here (Spark column vs DuckDB twin over the same
adversarial rows); the three new driver entries get their full
value-hash oracle run in the sweep harness + driver window.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _spark_vs_duck_url(spark, urls, col_fn, sql_fn):
    sdf = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.out for r in sdf.select(col_fn(F.col("url")).alias("out")).collect()]
    con = duckdb.connect()
    want = [
        con.execute("SELECT " + sql_fn(f"'{u}'")).fetchone()[0] for u in urls
    ]
    return got, want


ADVERSARIAL_URLS = [
    # bare tracking params (no '=') must drop — r10 ADVICE
    "http://example.com/p?fbclid",
    "http://example.com/p?a=1&fbclid&b=2",
    "http://example.com/p?gclid&utm_source",
    "http://example.com/p?utm_campaign",
    # ...but lookalike KEYS that only share a prefix must survive
    "http://example.com/p?fbclid2=x&gclids=1",
    # bracketed IPv6 literals: host keeps brackets, port splits after ']'
    "http://[::1]:8080/p",
    "http://[::1]:80/p",
    "http://[2001:DB8::1]/p?b=2&a=1",
    "HTTPS://[2001:db8::1]:443/x/",
    # the r10 surface must keep working
    "HTTP://WWW.Example.COM:80/a/b/?b=2&a=1&utm_source=feed#frag",
    "https://news.example.co.uk:8443/x",
    "not a url at all",
]


def test_normalize_url_cross_engine_on_adversarial_rows(spark):
    from shaha_spark.functions.url import normalize_url, normalize_url_sql

    got, want = _spark_vs_duck_url(
        spark, ADVERSARIAL_URLS, normalize_url, normalize_url_sql
    )
    assert got == want


def test_normalize_url_semantics(spark):
    from shaha_spark.functions.url import normalize_url

    sdf = spark.createDataFrame(
        [(u,) for u in ADVERSARIAL_URLS], "url string"
    )
    out = dict(
        zip(
            ADVERSARIAL_URLS,
            [
                r.out
                for r in sdf.select(
                    normalize_url(F.col("url")).alias("out")
                ).collect()
            ],
        )
    )
    # bare tracking params collapse with their key=value twins
    assert out["http://example.com/p?fbclid"] == "http://example.com/p"
    assert out["http://example.com/p?a=1&fbclid&b=2"] == (
        "http://example.com/p?a=1&b=2"
    )
    assert out["http://example.com/p?gclid&utm_source"] == (
        "http://example.com/p"
    )
    # prefix lookalikes are NOT tracking params
    assert out["http://example.com/p?fbclid2=x&gclids=1"] == (
        "http://example.com/p?fbclid2=x&gclids=1"
    )
    # IPv6: host intact, :8080 kept, :80 dropped for http, :443 for https
    assert out["http://[::1]:8080/p"] == "http://[::1]:8080/p"
    assert out["http://[::1]:80/p"] == "http://[::1]/p"
    assert out["http://[2001:DB8::1]/p?b=2&a=1"] == (
        "http://[2001:db8::1]/p?a=1&b=2"
    )
    assert out["HTTPS://[2001:db8::1]:443/x/"] == "https://[2001:db8::1]/x"


def test_registered_domain_custom_suffixes(spark):
    from shaha_spark.functions.url import (
        registered_domain,
        registered_domain_sql,
    )

    urls = [
        "http://a.b.shop.co.uk/x",
        "http://deep.sub.example.banana/x",
        "http://example.com/x",
    ]
    custom = ("example.banana",)
    sdf = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.d
        for r in sdf.select(
            registered_domain(F.col("url"), custom).alias("d")
        ).collect()
    ]
    # under the custom set co.uk is NOT special (its eTLD+1 is the
    # plain last-2 cut) but example.banana is
    assert got == ["co.uk", "sub.example.banana", "example.com"]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT " + registered_domain_sql(f"'{u}'", custom)
        ).fetchone()[0]
        for u in urls
    ]
    assert got == want


def test_url_dedup_threads_suffixes(spark):
    from shaha_spark.operators.dedup import url_dedup

    df = spark.createDataFrame(
        [(1, "http://a.x.example.banana/p"), (2, "http://b.x.example.banana/p")],
        "doc_id bigint, url string",
    )
    default = url_dedup(df, "url").collect()
    custom = url_dedup(df, "url", suffixes=("example.banana",)).collect()
    # default set: example.banana is no public suffix → eTLD+1 is the
    # last-2 cut; custom set: it is → the cut moves one label left
    assert {r.registered_domain for r in default} == {"example.banana"}
    assert {r.registered_domain for r in custom} == {"x.example.banana"}
    # a 2-label custom suffix changes the eTLD+1 cut on a 3-label host
    df2 = spark.createDataFrame(
        [(1, "http://x.example.banana/p")], "doc_id bigint, url string"
    )
    assert url_dedup(df2, "url").collect()[0].registered_domain == (
        "example.banana"
    )
    assert url_dedup(
        df2, "url", suffixes=("example.banana",)
    ).collect()[0].registered_domain == "x.example.banana"


def test_contamination_report_consistent_with_flag(spark, sf_dir):
    """The provenance report's distinct train ids must be EXACTLY the
    flag operator's contaminated set, and per-train window totals can
    only distribute across eval docs (sum over pairs >= flag count,
    each pair count >= 1)."""
    from shaha_spark.operators.sampling import hash_split
    from shaha_spark.operators.terms import (
        contamination_report,
        exact_substring_decontaminate,
    )

    split = hash_split(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        {"eval": 0.05, "test": 0.05, "train": 0.9},
        "doc_id",
        salt="r2",
    )
    train = split.filter(F.col("split") == "train")
    eval_df = split.filter(F.col("split") == "eval")
    flag = exact_substring_decontaminate(train, eval_df, min_len=32)
    rep = contamination_report(train, eval_df, min_len=32)
    flagged = {
        r.doc_id for r in flag.where(F.col("contaminated")).collect()
    }
    reported = {r.train_doc_id for r in rep.collect()}
    assert reported == flagged
    assert rep.where(F.col("n_shared_windows") < 1).count() == 0


def test_contamination_report_known_answer(spark):
    """Hand-checkable fixture: eval doc 100 shares one 8-char window
    with train docs 1 and 2 (each once), nothing with 3."""
    from shaha_spark.operators.terms import contamination_report

    train = spark.createDataFrame(
        [
            (1, "xxSECRET01xx"),
            (2, "yySECRET01yy"),
            (3, "zzzzzzzzzzzz"),
        ],
        "doc_id bigint, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "..SECRET01..")], "doc_id bigint, text string"
    )
    rows = sorted(
        map(tuple, contamination_report(train, eval_df, min_len=8).collect())
    )
    assert rows == [(100, 1, 1), (100, 2, 1)]


def test_domain_importance_sums_doc_weights(spark, sf_dir):
    """Per-domain totals must equal the decimal-exact sums of
    importance_weights' per-doc logweights (the composition claim in
    the docstring), and n_docs counts scored docs."""
    from shaha_spark.operators.sampling import (
        domain_importance,
        importance_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "domain", F.col("source")
    )
    target = docs.filter(F.col("lang") == "en")
    dw = importance_weights(docs, target).join(
        docs.select("doc_id", "domain"), "doc_id"
    )
    want = {
        (r.domain): (r.n, round(r.tot, 6))
        for r in dw.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("logweight").alias("tot"),
        )
        .collect()
    }
    got = {
        r.domain: (r.n_docs, round(r.total_logweight, 6))
        for r in domain_importance(docs, target).collect()
    }
    assert set(got) == set(want)
    for d, (n, tot) in want.items():
        assert got[d][0] == n
        # per-doc double casts vs one decimal total: equal to 1e-6
        assert abs(got[d][1] - tot) < 1e-6, (d, got[d], (n, tot))


def test_domain_resample_topk(spark, sf_dir):
    from shaha_spark.operators.sampling import (
        domain_importance,
        domain_resample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "domain", F.col("source")
    )
    target = docs.filter(F.col("lang") == "en")
    all_rows = sorted(
        domain_importance(docs, target).collect(),
        key=lambda r: (-r.mean_doc_logweight, r.domain),
    )
    top2 = domain_resample(docs, target, k=2).collect()
    assert [r.domain for r in top2] == [r.domain for r in all_rows[:2]]


LICENSE_CASES = [
    ("plain text, no licence at all", "none", False),
    ("Copyright 2020. All Rights Reserved.", "all-rights-reserved", False),
    ("shared under cc by 4.0 terms", "cc-by", True),
    ("Creative Commons Attribution licence", "cc-by", True),
    ("licence: CC BY-NC 2.0", "cc-by-nc", False),
    ("licence: cc-by-sa", "cc-by-sa", True),
    ("released into the Public Domain", "public-domain", True),
    ("marked CC0 by the author", "public-domain", True),
    # restrictive beats permissive when both appear
    ("CC BY-NC — not the plain CC BY", "cc-by-nc", False),
    # 'cc by' needs word boundaries: no false fire inside other words
    ("the acc by-pass valve", "none", False),
]


def test_license_scan_known_answers(spark):
    from shaha_spark.operators.textops import license_scan

    df = spark.createDataFrame(
        [(i, t) for i, (t, _l, _o) in enumerate(LICENSE_CASES)],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.license, r.open_license)
        for r in license_scan(df).collect()
    }
    for i, (_t, lic, is_open) in enumerate(LICENSE_CASES):
        assert got[i] == (lic, is_open), (i, LICENSE_CASES[i], got[i])


def test_license_scan_cross_engine(spark):
    from shaha_spark.operators.textops import license_scan, license_scan_sql

    df = spark.createDataFrame(
        [(i, t) for i, (t, _l, _o) in enumerate(LICENSE_CASES)],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.doc_id, r.license, bool(r.open_license))
        for r in license_scan(df).collect()
    )
    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{t.replace(chr(39), chr(39) * 2)}')"
        for i, (t, _l, _o) in enumerate(LICENSE_CASES)
    )
    want = sorted(
        (int(a), b, bool(c))
        for a, b, c in con.execute(
            license_scan_sql(
                f"SELECT * FROM (VALUES {values}) AS v(doc_id, text)"
            )
        ).fetchall()
    )
    assert got == want


def test_url_policy_scan_semantics(spark):
    from shaha_spark.operators.dedup import url_policy_scan

    df = spark.createDataFrame(
        [
            (1, "http://a.shop.co.uk/p/5"),          # domain-blocked
            (2, "http://sub.shop.co.uk/p/35"),       # domain beats pattern
            (3, "http://ok.example.com/p/35?x=1"),   # pattern-blocked
            (4, "http://ok.example.com/p/5"),        # clean
            (5, None),                                # no URL to screen
        ],
        "doc_id bigint, url string",
    )
    got = {
        r.doc_id: (r.registered_domain, r.block_reason, r.blocked)
        for r in url_policy_scan(
            df,
            "url",
            blocked_domains=("shop.co.uk",),
            blocked_patterns=("/p/3[0-9]",),
        ).collect()
    }
    assert got[1] == ("shop.co.uk", "domain", True)
    assert got[2] == ("shop.co.uk", "domain", True)
    assert got[3] == ("example.com", "pattern", True)
    assert got[4] == ("example.com", "none", False)
    assert got[5] == (None, "none", False)


def test_url_policy_scan_cross_engine(spark):
    from shaha_spark.operators.dedup import (
        url_policy_scan,
        url_policy_scan_sql,
    )

    rows = [
        (1, "http://a.shop.co.uk/p/5"),
        (2, "http://sub.shop.co.uk/p/35"),
        (3, "http://ok.example.com/p/35?x=1"),
        (4, "http://ok.example.com/p/5"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = sorted(
        (r.doc_id, r.registered_domain, r.block_reason, bool(r.blocked))
        for r in url_policy_scan(
            df,
            "url",
            blocked_domains=("shop.co.uk",),
            blocked_patterns=("/p/3[0-9]",),
        ).collect()
    )
    values = ", ".join(f"({i}, '{u}')" for i, u in rows)
    con = duckdb.connect()
    want = sorted(
        (int(a), b, c, bool(d))
        for a, b, c, d in con.execute(
            url_policy_scan_sql(
                f"SELECT * FROM (VALUES {values}) AS v(doc_id, url)",
                "url",
                blocked_domains=("shop.co.uk",),
                blocked_patterns=("/p/3[0-9]",),
            )
        ).fetchall()
    )
    assert got == want


def test_url_policy_scan_empty_policy(spark):
    """No rules → everything reports none/false in both engines (the
    SQL twin must not emit an empty CASE)."""
    from shaha_spark.operators.dedup import (
        url_policy_scan,
        url_policy_scan_sql,
    )

    df = spark.createDataFrame(
        [(1, "http://x.example.com/p")], "doc_id bigint, url string"
    )
    r = url_policy_scan(df, "url").collect()[0]
    assert (r.block_reason, r.blocked) == ("none", False)
    con = duckdb.connect()
    o = con.execute(
        url_policy_scan_sql(
            "SELECT 1 AS doc_id, 'http://x.example.com/p' AS url", "url"
        )
    ).fetchone()
    assert (o[2], bool(o[3])) == ("none", False)


def test_license_scan_null_text_is_none(spark):
    from shaha_spark.operators.textops import license_scan

    df = spark.createDataFrame(
        [(1, None), (2, "cc by 4.0")], "doc_id bigint, text string"
    )
    got = sorted(map(tuple, license_scan(df).collect()))
    # a NULL text carries no licence signal: 'none', not-open, and the
    # row is KEPT (one verdict per input doc, never a silent drop)
    assert got == [(1, "none", False), (2, "cc-by", True)]


def test_contamination_report_null_texts_drop(spark):
    """NULL texts shingle to nothing on either side: a NULL train doc
    can't be reported, a NULL eval doc can't contaminate — and the
    non-NULL pair still reports."""
    from shaha_spark.operators.terms import contamination_report

    train = spark.createDataFrame(
        [(1, None), (2, "xxxxxxxxxxSECRETOKEN")],
        "doc_id bigint, text string",
    )
    eval_df = spark.createDataFrame(
        [(9, "SECRETOKEN"), (10, None)], "doc_id bigint, text string"
    )
    got = sorted(map(tuple, contamination_report(
        train, eval_df, min_len=10).collect()))
    assert got == [(9, 2, 1)]


def test_domain_importance_null_handling(spark):
    """NULL-text docs score no grams and drop from the aggregate;
    a NULL domain stays VISIBLE as its own group (silently dropping
    scored volume would misstate the mixture — callers filter)."""
    from shaha_spark.operators.sampling import domain_importance

    docs = spark.createDataFrame(
        [(1, "alpha beta", "d1"), (2, None, "d1"), (3, "alpha", None)],
        "doc_id bigint, text string, domain string",
    )
    rows = {r.domain: r for r in domain_importance(
        docs, docs.filter(F.col("doc_id") == 1)).collect()}
    assert set(rows) == {"d1", None}
    assert rows["d1"].n_docs == 1  # doc 2's NULL text never scored
    assert rows[None].n_docs == 1


def test_cluster_split_no_pair_straddles(spark, sf_dir):
    """The leakage property itself: every near-dup edge's two docs
    land in the SAME split; the split is exhaustive and disjoint; and
    isolated docs split exactly as a plain hash_split of their own id
    (cluster_split degrades to hash_split when the graph is empty on
    them)."""
    from shaha_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_similarity,
    )
    from shaha_spark.operators.sampling import cluster_split, hash_split

    weights = {"eval": 0.05, "test": 0.05, "train": 0.9}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(docs)
    edges = minhash_similarity(
        sigs, lsh_candidate_pairs(sigs)
    ).where(F.col("est_jaccard") >= 0.7).select("id_a", "id_b")
    edge_rows = edges.collect()
    assert edge_rows, "fixture has no near-dup pairs — test is vacuous"

    out = cluster_split(
        docs.select("doc_id"), edges, weights, salt="cs"
    )
    split_of = {r.doc_id: r.split for r in out.collect()}
    assert len(split_of) == docs.count()  # exhaustive, one row per doc
    for e in edge_rows:
        assert split_of[e.id_a] == split_of[e.id_b], (e, "straddles")

    linked = {e.id_a for e in edge_rows} | {e.id_b for e in edge_rows}
    plain = {
        r.doc_id: r.split
        for r in hash_split(
            docs.select("doc_id"), weights, "doc_id", salt="cs"
        ).collect()
    }
    for doc, s in split_of.items():
        if doc not in linked:
            assert s == plain[doc]


def test_cluster_split_known_graph(spark):
    """Hand-checkable: a 3-chain {1-2, 2-3} moves with doc 1's
    assignment; isolated 9 keeps its own."""
    from shaha_spark.operators.sampling import cluster_split

    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (9,)], "doc_id bigint"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    rows = {
        r.doc_id: (r.cluster_rep, r.split)
        for r in cluster_split(
            docs, edges, {"a": 0.5, "b": 0.5}, salt="x"
        ).collect()
    }
    assert rows[1][0] == rows[2][0] == rows[3][0] == 1
    assert rows[1][1] == rows[2][1] == rows[3][1]
    assert rows[9][0] == 9
